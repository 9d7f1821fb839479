from quanta_tpu.cli import main

main()
