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
    admit_seq: int = 0  # monotone admission order (preemption picks newest)

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
        max_top_k: int = 0,
        max_admits_per_step: int = 1,
        kv_quant: bool = False,
        rng_seed: int = 0,
        recorder=None,
        pipeline: bool = True,
        multi_step: int = 1,
    ):
        self.params = params
        self.cfg = cfg
        self.n_slots = n_slots
        self.page_size = page_size
        # top_k: engine-wide static truncation applied to every request.
        # max_top_k: static CAP under which each request's own sampling.top_k
        # is honored every step (0 disables per-request top-k; requests
        # asking for it are rejected at submit instead of silently ignored).
        self.top_k = top_k
        self.max_top_k = max_top_k
        self.max_admits_per_step = max_admits_per_step
        self.prefill_buckets = tuple(
            sorted({b for b in prefill_buckets if b < cfg.max_seq_len}
                   | {cfg.max_seq_len})
        )
        self.eos_id = eos_id
        self.use_kernel = use_kernel
        if n_pages is None:  # default: room for every slot at max_seq_len
            n_pages = 1 + n_slots * -(-cfg.max_seq_len // page_size)
        self.max_pages_per_slot = -(-cfg.max_seq_len // page_size)
        self.kv_quant = kv_quant
        self.pool = kvcache.init_pool(cfg, n_pages, page_size,
                                      kv_quant=kv_quant)
        # decode-step page-table width buckets (doubling up to the max):
        # the jitted decode step reads the pool through the table, so its
        # HBM traffic scales with the WIDEST active sequence's bucket, not
        # with max_seq_len — one compile per bucket, like prefill buckets.
        self.decode_page_buckets = []
        b = 1
        while b < self.max_pages_per_slot:
            self.decode_page_buckets.append(b)
            b *= 2
        self.decode_page_buckets.append(self.max_pages_per_slot)
        self.alloc = kvcache.PageAllocator(n_pages)
        self.slots = [_Slot() for _ in range(n_slots)]
        self.waiting: Deque[Request] = deque()
        self.finished: List[Request] = []
        self._page_table = np.zeros(
            (n_slots, self.max_pages_per_slot), np.int32
        )
        self._rng = jax.random.PRNGKey(rng_seed)
        # decode-path RNG lives ON DEVICE (split in-program each step);
        # the host never reads it. Admission sampling uses self._rng.
        self._dev_key = jax.random.PRNGKey(rng_seed + 1)
        # device-resident scheduler state: when no scheduling event
        # (admit/retire/preempt/growth) happened since the last dispatch
        # and the active set is unchanged, the next dispatch reuses the
        # previous step's returned positions and the cached page table /
        # sampling params — zero host->device uploads per steady step.
        self._dev = None
        self._sched_dirty = True
        # pipelined ("async") stepping: each step() dispatches the fused
        # decode+sample program WITHOUT reading it back, then processes the
        # PREVIOUS step's tokens — so host bookkeeping, scheduling and the
        # device->host transfer overlap the chip's current step instead of
        # serializing with it. Sampled tokens chain step-to-step on device.
        self.pipeline = pipeline
        # multi-token scheduling: dispatch up to ``multi_step`` decode
        # steps in ONE device program (runner.decode_multi_step), paying
        # one dispatch + one readback per window instead of per token.
        # Amortizes host-link latency; admission/retire granularity
        # becomes the window. 1 = per-token (lowest TTFT jitter).
        self.multi_step = max(1, multi_step)
        self._pending = None  # {"ids": [(slot, uid)], "tokens": (k, B), "k": k}
        self._steps = 0
        self._decode_tokens = 0
        self._t_serve = 0.0
        self._admit_counter = 0
        self._preemptions = 0
        self.recorder = recorder  # optional quanta_tpu.metrics.MetricsRecorder

    # ------------------------------------------------------------- intake

    def submit(self, req: Request) -> None:
        """Enqueue a request, rejecting up front anything the engine could
        never serve (so the step loop can't deadlock on the head of line)."""
        prompt_len = len(req.prompt)
        # multi_step > 1 reserves window headroom: a retire discovered
        # mid-window may have written up to multi_step-1 positions past
        # the request's own budget
        total_len = prompt_len + req.max_new_tokens + self.multi_step - 1
        if total_len > self.cfg.max_seq_len:
            raise ValueError(
                f"request {req.uid}: prompt ({prompt_len}) + max_new_tokens "
                f"({req.max_new_tokens}) + window headroom "
                f"({self.multi_step - 1}) exceeds max_seq_len "
                f"{self.cfg.max_seq_len}"
            )
        worst_pages = self._pages_needed(total_len)
        capacity = self.alloc.n_pages - 1  # page 0 is the reserved null page
        if worst_pages > capacity:
            raise ValueError(
                f"request {req.uid}: worst-case page need {worst_pages} "
                f"exceeds pool capacity {capacity}; raise n_pages"
            )
        if req.sampling.top_k > self.max_top_k:
            raise ValueError(
                f"request {req.uid}: sampling.top_k={req.sampling.top_k} "
                f"exceeds the engine's static max_top_k={self.max_top_k}; "
                "construct the Engine with a larger max_top_k"
            )
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
        # Pages are allocated for the REAL prompt length (+1 token of
        # headroom so the decode step right after admission can always
        # write the first generated token's KV), NOT for the padded
        # prefill bucket: the bucket's padding positions write into the
        # reserved null page 0, which attention always masks. This keeps
        # page pressure proportional to actual tokens and guarantees a
        # preempted-and-regrown request can always be re-admitted.
        n_real = self._pages_needed(max(prompt_len, 1))
        n_keep = self._pages_needed(prompt_len + 1)
        if n_keep > self.alloc.free_pages:
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
        pages = self.alloc.alloc(n_keep)
        n_bucket_pages = self._pages_needed(bucket)
        write_vec = pages[:n_real] + [0] * (n_bucket_pages - n_real)
        self.pool = kvcache.write_prefill(
            self.pool, jnp.asarray(write_vec, jnp.int32), k_seq, v_seq
        )
        self._rng, key = jax.random.split(self._rng)
        first = int(sample(last_logits[None], key, req.sampling)[0])
        if not req.t_first_token:  # preserved across preemption
            req.t_first_token = time.perf_counter()
        req.output.append(first)

        slot.request = req
        slot.pages = pages
        slot.seq_len = prompt_len
        slot.last_token = first
        self._sched_dirty = True
        self._admit_counter += 1
        slot.admit_seq = self._admit_counter
        self._page_table[slot_id, :] = 0
        self._page_table[slot_id, : len(pages)] = pages
        self._maybe_finish(slot_id, first)
        return True

    def _grow_if_needed(self, slot_id: int, ahead: int = 1) -> bool:
        """Ensure pages for positions ``seq_len .. seq_len+ahead-1`` exist
        (the next dispatch writes KV at those positions).
        Returns False if the pool runs out of pages (caller preempts)."""
        slot = self.slots[slot_id]
        page_idx = (slot.seq_len + ahead - 1) // self.page_size
        if page_idx >= self.max_pages_per_slot:
            raise MemoryError(
                f"request {slot.request.uid} exceeded max_seq_len "
                f"{self.cfg.max_seq_len}"
            )
        while len(slot.pages) <= page_idx:
            if self.alloc.free_pages < 1:
                return False
            (new_page,) = self.alloc.alloc(1)
            slot.pages.append(new_page)
            self._page_table[slot_id, len(slot.pages) - 1] = new_page
            self._sched_dirty = True
        return True

    def _preempt(self, slot_id: int) -> None:
        """Evict a running request under pool pressure: free its pages and
        requeue it at the head of the line with its generated tokens folded
        into the prompt, so re-admission re-prefills the full context and
        generation resumes exactly where it stopped (t_first_token and the
        max_new_tokens budget are preserved)."""
        slot = self.slots[slot_id]
        req = slot.request
        req.prompt = np.concatenate(
            [np.asarray(req.prompt, np.int32),
             np.asarray(req.output, np.int32)]
        )
        self.alloc.free(slot.pages)
        self._page_table[slot_id, :] = 0
        self.slots[slot_id] = _Slot()
        self.waiting.appendleft(req)
        self._sched_dirty = True
        self._preemptions += 1
        if self.recorder is not None:
            self.recorder.count("preemptions", 1)

    def _ensure_growth(self, slot_id: int, ahead: int = 1) -> None:
        """Backpressure instead of MemoryError: when the pool is exhausted
        mid-decode, preempt the most recently admitted *other* request until
        this slot can grow. Submit-time capacity checks guarantee progress:
        a lone request's worst-case page need always fits the pool."""
        while not self._grow_if_needed(slot_id, ahead):
            victims = [
                i
                for i, s in enumerate(self.slots)
                if s.busy and i != slot_id
            ]
            if not victims:
                raise MemoryError(
                    f"KV pool exhausted with a single active request "
                    f"(uid {self.slots[slot_id].request.uid}); this should "
                    "be impossible past the submit-time capacity check"
                )
            self._preempt(max(victims, key=lambda i: self.slots[i].admit_seq))

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
            self._sched_dirty = True
        return done

    # ----------------------------------------------------------- step loop

    def _dispatch(self) -> int:
        """Dispatch ONE fused decode+sample step for every dispatchable
        slot, without reading the result back. Returns slots dispatched.

        A slot is dispatchable if its output budget cannot already be
        exhausted by the still-unprocessed pending token (so the optimistic
        extra step never writes KV past max_seq_len). Growth for the
        position this step writes (seq_len) is ensured up front, with
        pool-pressure preemption as usual; seq_len then advances
        optimistically — processing only appends tokens and retires."""
        cand = []
        pend_uid = (
            dict(self._pending["ids"]) if self._pending is not None else {}
        )
        pend_k = self._pending["k"] if self._pending is not None else 0
        for i, s in enumerate(self.slots):
            if not s.busy:
                continue
            in_flight = pend_k if pend_uid.get(i) == s.request.uid else 0
            rem = s.request.max_new_tokens - len(s.request.output) - in_flight
            if rem <= 0:
                continue  # retires when the pending tokens are processed
            cand.append(i)
        if not cand:
            return 0
        # the window is ALWAYS multi_step tokens (one compiled program per
        # page-width bucket, nothing else): a slot whose budget ends
        # mid-window gets its overshoot trimmed at processing — submit()
        # reserved the KV headroom for exactly this
        k = self.multi_step
        # senior-first growth (covering all k window positions): under
        # pool pressure older requests preempt newer ones, never the
        # other way around
        for i in sorted(cand, key=lambda i: self.slots[i].admit_seq):
            if self.slots[i].busy:
                self._ensure_growth(i, ahead=k)
        cand = [i for i in cand if self.slots[i].busy]  # preemption culls
        if not cand:
            return 0

        # bucket the page-table width by the widest active sequence: the
        # window reads up to position seq_len+k-1, so the pool gather
        # (the decode HBM floor) scales with actual lengths
        need = max(
            (self.slots[i].seq_len + k - 1) // self.page_size + 1
            for i in cand
        )
        width = next(b for b in self.decode_page_buckets if b >= need)
        self._last_decode_width = width

        ids = [(i, self.slots[i].request.uid) for i in cand]
        steady = (
            not self._sched_dirty
            and self._dev is not None
            and self._dev["ids"] == ids
            and self._dev["width"] == width
            and self._dev["k"] == k
            and self._pending is not None
            and self._pending["ids"] == ids
        )
        if steady:
            # zero host->device uploads: every input is the device output
            # of the previous step or an unchanged cached array
            tokens_in = self._pending["tokens"][-1]
            positions_dev = self._dev["pos"]
            table_dev = self._dev["table"]
            temps_dev = self._dev["temps"]
            topks_dev = self._dev["topks"]
        else:
            positions = np.full((self.n_slots,), -1, np.int32)
            host_tokens = np.zeros((self.n_slots,), np.int32)
            temps = np.zeros((self.n_slots,), np.float32)
            top_ks = np.zeros((self.n_slots,), np.int32)
            chain = np.zeros((self.n_slots,), bool)
            pending_uid = (
                dict(self._pending["ids"]) if self._pending is not None
                else {}
            )
            for i in cand:
                s = self.slots[i]
                positions[i] = s.seq_len
                host_tokens[i] = s.last_token  # valid unless chained
                temps[i] = s.request.sampling.temperature
                top_ks[i] = s.request.sampling.top_k
                # a slot with an unprocessed step chains its input token
                # from that step's device output (the host hasn't seen it
                # yet); the uid check guards against the slot having been
                # preempted and reseated since that dispatch
                chain[i] = pending_uid.get(i) == s.request.uid
            tokens_in = jnp.asarray(host_tokens)
            if self._pending is not None and chain.any():
                tokens_in = jnp.where(
                    jnp.asarray(chain), self._pending["tokens"][-1],
                    tokens_in,
                )
            positions_dev = jnp.asarray(positions)
            table_dev = jnp.asarray(self._page_table[:, :width])
            temps_dev = jnp.asarray(temps)
            topks_dev = jnp.asarray(top_ks)

        toks_seq, next_positions, self._dev_key, self.pool = (
            runner.decode_multi_step(
                self.params,
                self.pool,
                table_dev,
                positions_dev,
                tokens_in,
                self._dev_key,
                temps_dev,
                topks_dev,
                self.cfg,
                self.page_size,
                k,
                use_kernel=self.use_kernel,
                top_k=self.top_k,
                max_top_k=self.max_top_k,
            )
        )
        for i in cand:
            self.slots[i].seq_len += k
        self._dev = {
            "ids": ids,
            "width": width,
            "k": k,
            "table": table_dev,
            "pos": next_positions,
            "temps": temps_dev,
            "topks": topks_dev,
        }
        self._sched_dirty = False
        self._steps += 1
        if self.recorder is not None:
            self.recorder.count("decode_dispatches", 1)
            if steady:
                self.recorder.count("steady_steps", 1)
        self._pending_new = {"ids": ids, "tokens": toks_seq, "k": k}
        return len(cand)

    def _process_pending(self) -> int:
        """Read back the oldest in-flight step's tokens and do the host
        bookkeeping (append, EOS/max retire). Returns tokens kept."""
        if self._pending is None:
            return 0
        t0 = time.perf_counter()
        tokens = np.asarray(self._pending["tokens"])  # (k, n_slots)
        kept = 0
        for t in range(self._pending["k"]):
            for slot_id, uid in self._pending["ids"]:
                slot = self.slots[slot_id]
                if slot.request is None or slot.request.uid != uid:
                    continue  # preempted/retired/EOS: window tail dropped
                tok = int(tokens[t, slot_id])
                slot.request.output.append(tok)
                slot.last_token = tok
                kept += 1
                self._maybe_finish(slot_id, tok)
        self._pending = None
        self._decode_tokens += kept
        if self.recorder is not None:
            self.recorder.count("decode_tokens", kept)
            self.recorder.observe("decode_step", time.perf_counter() - t0)
        return kept

    def step(self) -> int:
        """Admit up to ``max_admits_per_step`` requests, dispatch one
        decode step, then process the previous step's tokens. Returns the
        number of tokens processed (0 on pipeline-fill steps).

        The admission budget bounds how long running requests can stall on
        newcomers' prefills in any single step (one prefill's latency,
        rather than up to n_slots of them back-to-back); admission still
        happens every step, so free slots refill continuously. If no slot
        is decoding there is nothing to stall — admit until full."""
        budget = self.max_admits_per_step
        if not any(s.busy for s in self.slots):
            budget = self.n_slots
        while budget > 0 and self._try_admit():
            budget -= 1

        self._pending_new = None
        self._dispatch()
        if not self.pipeline and self._pending_new is not None:
            # synchronous mode: process the step we just dispatched
            self._pending = self._pending_new
            self._pending_new = None
        produced = self._process_pending()
        if self._pending_new is not None:
            self._pending = self._pending_new
            self._pending_new = None
        return produced

    @property
    def _draining(self) -> bool:
        return bool(
            self.waiting
            or self._pending is not None
            or any(s.busy for s in self.slots)
        )

    def warm_widths(self, max_width_need: int, max_new: int = 2) -> None:
        """Compile the decode programs for every page-width bucket up to
        ``max_width_need`` pages by serving short dummy requests (benches
        call this so measured traces are steady-state, not compilation).
        Dummy requests are dropped from ``finished`` and the counters."""
        for b in self.decode_page_buckets:
            if b > max_width_need:
                break
            plen = max(1, b * self.page_size - self.multi_step - max_new - 1)
            self.submit(Request(uid=-1_000_000 - b,
                                prompt=np.zeros(plen, np.int32),
                                max_new_tokens=max_new))
            while self._draining:
                self.step()
        self.finished = [r for r in self.finished if r.uid > -1_000_000]
        self._steps = 0
        self._decode_tokens = 0
        self._t_serve = 0.0

    def run(self, requests: Sequence[Request]) -> List[Request]:
        """Serve a batch of requests to completion; returns them finished."""
        for r in requests:
            self.submit(r)
        t0 = time.perf_counter()
        while self._draining:
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
            "preemptions": self._preemptions,
        }
        if ttfts:
            m["ttft_p50_ms"] = round(1e3 * ttfts[len(ttfts) // 2], 2)
            m["ttft_p99_ms"] = round(
                1e3 * ttfts[min(len(ttfts) - 1, int(len(ttfts) * 0.99))], 2
            )
        if self.recorder is not None:
            m.update(self.recorder.snapshot())
        return m
