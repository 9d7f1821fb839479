"""Continuous-batching serving engine.

North-star config 3 (BASELINE.json: "LLM.int8() inference, 1 host,
continuous batching") and SURVEY.md §7 layer 6 / hard part 5: a host-side
scheduler feeding fixed-shape jitted device programs, so nothing ever
recompiles mid-serve:

  admit   — when a slot is free and the page pool has room, pop the next
            waiting request, prefill its prompt (bucketed static length),
            scatter the prompt KV into freshly allocated pages, and seat
            it in the slot. Admission happens *between* decode steps —
            running requests never stall on a newcomer's prefill finishing
            (that is the "continuous" in continuous batching).
  decode  — ONE token for ALL active slots per step through the paged
            decode program (serve/runner.py), lazily allocating a new KV
            page only when a sequence actually crosses a page boundary.
  retire  — on EOS or max_new_tokens, free the slot + its pages and
            record completion; the next admit reuses them immediately.

Metrics per request: TTFT (arrival -> first token on host) and decode
latency; aggregate throughput from the step loop. These are the
BASELINE.json metric set (tokens/sec/chip, p50 TTFT).
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Deque, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from quanta_tpu.models.llama import LlamaConfig
from quanta_tpu.serve import kvcache, runner
from quanta_tpu.serve.sampling import SamplingParams, _sample_batch, sample


@dataclasses.dataclass
class Request:
    uid: int
    prompt: np.ndarray  # (S,) int32
    max_new_tokens: int
    sampling: SamplingParams = dataclasses.field(default_factory=SamplingParams)
    # filled in by the engine
    output: List[int] = dataclasses.field(default_factory=list)
    t_arrival: float = 0.0
    t_first_token: float = 0.0
    t_done: float = 0.0

    @property
    def ttft(self) -> float:
        return self.t_first_token - self.t_arrival

    @property
    def finished(self) -> bool:
        return self.t_done > 0


@dataclasses.dataclass
class _Slot:
    request: Optional[Request] = None
    pages: List[int] = dataclasses.field(default_factory=list)
    seq_len: int = 0  # tokens whose KV is already in the pool
    last_token: int = 0

    @property
    def busy(self) -> bool:
        return self.request is not None


class Engine:
    """Single-host continuous-batching engine over a (possibly sharded,
    possibly quantized) Llama param tree."""

    def __init__(
        self,
        params,
        cfg: LlamaConfig,
        *,
        n_slots: int = 8,
        page_size: int = 16,
        n_pages: Optional[int] = None,
        prefill_buckets: Sequence[int] = (32, 64, 128, 256, 512, 1024),
        eos_id: Optional[int] = None,
        use_kernel: Optional[bool] = None,
        top_k: int = 0,
        rng_seed: int = 0,
        recorder=None,
    ):
        self.params = params
        self.cfg = cfg
        self.n_slots = n_slots
        self.page_size = page_size
        self.top_k = top_k
        self.prefill_buckets = tuple(
            sorted({b for b in prefill_buckets if b < cfg.max_seq_len}
                   | {cfg.max_seq_len})
        )
        self.eos_id = eos_id
        self.use_kernel = use_kernel
        if n_pages is None:  # default: room for every slot at max_seq_len
            n_pages = 1 + n_slots * -(-cfg.max_seq_len // page_size)
        self.max_pages_per_slot = -(-cfg.max_seq_len // page_size)
        self.pool = kvcache.init_pool(cfg, n_pages, page_size)
        self.alloc = kvcache.PageAllocator(n_pages)
        self.slots = [_Slot() for _ in range(n_slots)]
        self.waiting: Deque[Request] = deque()
        self.finished: List[Request] = []
        self._page_table = np.zeros(
            (n_slots, self.max_pages_per_slot), np.int32
        )
        self._rng = jax.random.PRNGKey(rng_seed)
        self._steps = 0
        self._decode_tokens = 0
        self._t_serve = 0.0
        self.recorder = recorder  # optional quanta_tpu.metrics.MetricsRecorder

    # ------------------------------------------------------------- intake

    def submit(self, req: Request) -> None:
        req.t_arrival = req.t_arrival or time.perf_counter()
        self.waiting.append(req)

    # ----------------------------------------------------------- scheduler

    def _pages_needed(self, n_tokens: int) -> int:
        return -(-n_tokens // self.page_size)

    def _try_admit(self) -> bool:
        """Seat one waiting request into a free slot. Returns True if seated."""
        if not self.waiting:
            return False
        free = [i for i, s in enumerate(self.slots) if not s.busy]
        if not free:
            return False
        req = self.waiting[0]
        prompt_len = len(req.prompt)
        bucket = runner.pick_bucket(prompt_len, self.prefill_buckets)
        n_prompt_pages = self._pages_needed(bucket)
        if n_prompt_pages > self.alloc.free_pages:
            return False  # pool pressure: wait for a retirement
        self.waiting.popleft()
        slot_id = free[0]
        slot = self.slots[slot_id]

        toks = np.zeros((1, bucket), np.int32)
        toks[0, :prompt_len] = req.prompt
        last_logits, k_seq, v_seq = runner.prefill(
            self.params,
            jnp.asarray(toks),
            jnp.int32(prompt_len),
            self.cfg,
            use_kernel=self.use_kernel,
        )
        pages = self.alloc.alloc(n_prompt_pages)
        self.pool = kvcache.write_prefill(
            self.pool, jnp.asarray(pages, jnp.int32), k_seq, v_seq
        )
        self._rng, key = jax.random.split(self._rng)
        first = int(sample(last_logits[None], key, req.sampling)[0])
        req.t_first_token = time.perf_counter()
        req.output.append(first)

        slot.request = req
        slot.pages = pages
        slot.seq_len = prompt_len
        slot.last_token = first
        self._page_table[slot_id, :] = 0
        self._page_table[slot_id, :n_prompt_pages] = pages
        if self._maybe_finish(slot_id, first):
            return True
        self._grow_if_needed(slot_id)
        return True

    def _grow_if_needed(self, slot_id: int) -> None:
        """Ensure the page holding position ``seq_len`` exists (the next
        decode step writes the KV of last_token at that position)."""
        slot = self.slots[slot_id]
        page_idx = slot.seq_len // self.page_size
        if page_idx >= self.max_pages_per_slot:
            raise MemoryError(
                f"request {slot.request.uid} exceeded max_seq_len "
                f"{self.cfg.max_seq_len}"
            )
        if page_idx >= len(slot.pages):
            (new_page,) = self.alloc.alloc(1)
            slot.pages.append(new_page)
            self._page_table[slot_id, page_idx] = new_page

    def _maybe_finish(self, slot_id: int, token: int) -> bool:
        slot = self.slots[slot_id]
        req = slot.request
        done = len(req.output) >= req.max_new_tokens or (
            self.eos_id is not None and token == self.eos_id
        )
        if done:
            req.t_done = time.perf_counter()
            self.finished.append(req)
            self.alloc.free(slot.pages)
            self._page_table[slot_id, :] = 0
            self.slots[slot_id] = _Slot()
        return done

    # ----------------------------------------------------------- step loop

    def step(self) -> int:
        """Admit as many requests as fit, then run one decode step.
        Returns the number of active slots that produced a token."""
        while self._try_admit():
            pass
        active_ids = [i for i, s in enumerate(self.slots) if s.busy]
        if not active_ids:
            return 0
        t_step0 = time.perf_counter()

        positions = np.full((self.n_slots,), -1, np.int32)
        tokens = np.zeros((self.n_slots,), np.int32)
        for i in active_ids:
            positions[i] = self.slots[i].seq_len
            tokens[i] = self.slots[i].last_token

        logits, self.pool = runner.decode_step(
            self.params,
            self.pool,
            jnp.asarray(self._page_table),
            jnp.asarray(positions),
            jnp.asarray(tokens),
            self.cfg,
            self.page_size,
            use_kernel=self.use_kernel,
        )
        self._rng, key = jax.random.split(self._rng)
        temps = np.zeros((self.n_slots,), np.float32)
        for i in active_ids:
            temps[i] = self.slots[i].request.sampling.temperature
        next_tokens = np.asarray(
            _sample_batch(logits, key, jnp.asarray(temps), top_k=self.top_k)
        )

        self._steps += 1
        self._decode_tokens += len(active_ids)
        if self.recorder is not None:
            self.recorder.count("decode_tokens", len(active_ids))
            self.recorder.observe("decode_step", time.perf_counter() - t_step0)
        for i in active_ids:
            slot = self.slots[i]
            tok = int(next_tokens[i])
            slot.request.output.append(tok)
            slot.seq_len += 1
            slot.last_token = tok
            if not self._maybe_finish(i, tok):
                self._grow_if_needed(i)
        return len(active_ids)

    def run(self, requests: Sequence[Request]) -> List[Request]:
        """Serve a batch of requests to completion; returns them finished."""
        for r in requests:
            self.submit(r)
        t0 = time.perf_counter()
        while self.waiting or any(s.busy for s in self.slots):
            self.step()
        self._t_serve += time.perf_counter() - t0
        return self.finished

    # ------------------------------------------------------------- metrics

    def metrics(self) -> Dict[str, float]:
        ttfts = sorted(r.ttft for r in self.finished if r.t_first_token)
        total_out = sum(len(r.output) for r in self.finished)
        m = {
            "requests_finished": len(self.finished),
            "output_tokens": total_out,
            "decode_steps": self._steps,
            "serve_seconds": round(self._t_serve, 4),
            "throughput_tok_s": round(total_out / self._t_serve, 1)
            if self._t_serve
            else 0.0,
            "pool_pages_free": self.alloc.free_pages,
        }
        if ttfts:
            m["ttft_p50_ms"] = round(1e3 * ttfts[len(ttfts) // 2], 2)
            m["ttft_p99_ms"] = round(
                1e3 * ttfts[min(len(ttfts) - 1, int(len(ttfts) * 0.99))], 2
            )
        if self.recorder is not None:
            m.update(self.recorder.snapshot())
        return m
