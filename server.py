"""Minimal HTTP inference server (std-lib only).

A production-shaped front-end over the same engine the CLI and Streamlit app
use: POST an image + prompt, get the generated text. Complements the
reference's Streamlit UI (reference: app.py) with a programmatic surface.

Endpoints:
  GET  /healthz            -> {"status": "ok", "model": "...", "device": "..."}
  GET  /metrics            -> serving observability JSON: HTTP response-code
      counters, in-flight count, slot occupancy, engine queue depth,
      deadline-eviction counters, useful-tok/s chunk EMA, speculative
      acceptance EMA + per-mode chunk counts (continuous mode)
  POST /generate           -> {"text": ..., "tokens": [...], "num_tokens": N}
      JSON body: {"prompt": str, "image_b64": base64-encoded image bytes,
                  "max_tokens": int=100, "temperature": float=0.8,
                  "top_p": float=0.9, "do_sample": bool=false,
                  "adapter": str|null}  (adapter: a LoRA adapter registered
                  at startup with --adapter NAME=DIR; continuous mode only —
                  every decode slot can serve a different adapter)
  POST /generate_stream    -> Server-Sent Events: one ``data: {"tokens": [...],
      "text_delta": "..."}`` event per compiled decode chunk, then
      ``data: {"done": true, "num_tokens": N}``.

Run: ``python server.py [--model_path PATH | --demo] [--port 8000]
[--batch_window_ms 0]``. With ``--batch_window_ms > 0``, concurrent
/generate requests arriving within the window coalesce into ONE padded batch
through ``serving.batch_generate`` (micro-batching: weight streaming
amortizes across the batch — measured 2006 tok/s aggregate at batch 8 vs
262 single-stream at 3B); streaming requests always run single-stream.

Backpressure & deadlines: at most ``--queue_depth`` requests are in flight
(queued + running) — the next one is rejected with **429 + Retry-After**
instead of waiting on an unbounded queue; a request that exceeds
``--request_timeout_s`` wall clock is evicted (its decode slot frees at the
next chunk boundary) and answered **504** (mid-SSE: a terminal ``error``
event). Deadlines arm after warm-up so cold compiles are never evicted.
"""
from __future__ import annotations

import argparse
import base64
import contextlib
import io
import json
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class ServerOverloaded(Exception):
    """Request queue at capacity -> HTTP 429 + Retry-After."""

    def __init__(self, depth: int):
        super().__init__(f"request queue full (depth {depth})")
        self.depth = depth


class RequestTimeout(Exception):
    """Per-request wall-clock deadline exceeded -> HTTP 504."""

    def __init__(self, deadline_s: float):
        super().__init__(f"request exceeded deadline of {deadline_s:.0f}s")
        self.deadline_s = deadline_s


class Admission:
    """Bounded admission control: at most ``depth`` requests in flight
    (queued + running) across every path; the (depth+1)-th is rejected
    immediately with ``ServerOverloaded`` instead of waiting on an unbounded
    queue. Shared by /generate and /generate_stream in all engine modes."""

    def __init__(self, depth: int = 64, deadline_s=None):
        self.depth = depth
        self.deadline_s = deadline_s if deadline_s else None
        self._n = 0
        self._mu = threading.Lock()

    @contextlib.contextmanager
    def slot(self):
        with self._mu:
            if self._n >= self.depth:
                raise ServerOverloaded(self.depth)
            self._n += 1
        try:
            yield
        finally:
            with self._mu:
                self._n -= 1


class Metrics:
    """Serving observability counters behind ``GET /metrics`` (std-lib JSON —
    the serving-grade analog of the reference's print-based observability,
    reference: ablation_study_fixed.py:519-561).

    HTTP response codes are counted centrally in the handler's ``_send``;
    engine-side gauges (slot occupancy, queue depth, spec acceptance) are
    read live from the batcher at scrape time; the chunk-throughput EMA is
    fed by the continuous runner's loop."""

    def __init__(self):
        self._mu = threading.Lock()
        self.counters: dict = {}
        self.tok_s_ema = None  # useful tokens/sec over recent decode chunks
        self.started = time.time()

    def inc(self, name: str, n: int = 1) -> None:
        with self._mu:
            self.counters[name] = self.counters.get(name, 0) + n

    def observe_chunk(self, tokens: int, dt_s: float) -> None:
        """One engine-loop iteration delivered ``tokens`` in ``dt_s``."""
        if dt_s <= 0 or tokens <= 0:
            return
        rate = tokens / dt_s
        with self._mu:
            self.tok_s_ema = (
                rate if self.tok_s_ema is None
                else 0.8 * self.tok_s_ema + 0.2 * rate
            )

    def snapshot(self) -> dict:
        with self._mu:
            out = dict(self.counters)
            out["uptime_s"] = round(time.time() - self.started, 1)
            if self.tok_s_ema is not None:
                out["chunk_tok_s_ema"] = round(self.tok_s_ema, 1)
        return out


class Engine:
    """Loaded model + processor with a serial inference lock."""

    def __init__(self, model_path=None, demo=True, quant="none"):
        from inference import load_for_cli

        self.params, self.cfg, self.processor = load_for_cli(
            model_path, demo, quant
        )
        from paligemma_tpu.processing import assert_aligned

        assert_aligned(self.processor, self.cfg)
        self.model_name = (model_path or "demo-tiny-random") + (
            f"+{quant}" if quant not in (None, "none") else ""
        )
        self.lock = threading.Lock()

    def generate(self, prompt, image, max_tokens, temperature, top_p, do_sample,
                 deadline_s=None):
        import jax
        import jax.numpy as jnp

        from paligemma_tpu import generation

        inputs = self.processor(text=[prompt], images=[image])
        ids = jnp.asarray(inputs["input_ids"])
        dtype = jax.tree.leaves(self.params)[0].dtype
        if hasattr(dtype, "name") and dtype.name.startswith("int"):
            dtype = jnp.bfloat16
        pix = jnp.asarray(inputs["pixel_values"], dtype)
        deadline = time.time() + deadline_s if deadline_s else None
        tokens: list = []
        with self.lock:
            # Chunked stream with a deadline check between compiled chunks:
            # one runaway max_tokens request cannot hold the engine lock past
            # its wall-clock budget (it is evicted at the next chunk boundary).
            for piece in generation.generate_chunked_stream(
                self.params, self.cfg, ids, pix,
                max_new_tokens=max_tokens,
                eos_token_id=self.processor.tokenizer.eos_token_id,
                do_sample=do_sample, temperature=temperature, top_p=top_p,
                cache_dtype=dtype,
            ):
                tokens.extend(piece)
                if deadline is not None and time.time() > deadline:
                    raise RequestTimeout(deadline_s)
        text = self.processor.tokenizer.decode(tokens, skip_special_tokens=True)
        return {"text": prompt + text, "tokens": tokens, "num_tokens": len(tokens)}

    def _act_dtype(self):
        import jax
        import jax.numpy as jnp

        dtype = jax.tree.leaves(self.params)[0].dtype
        if hasattr(dtype, "name") and dtype.name.startswith("int"):
            dtype = jnp.bfloat16
        return dtype

    def generate_stream(self, prompt, image, max_tokens, temperature, top_p,
                        do_sample, deadline_s=None):
        """Yields (new_tokens, text_delta) per compiled decode chunk.

        Generation runs in a worker thread that holds the engine lock only
        while computing; chunks flow through an unbounded queue. A slow or
        stalled SSE client therefore cannot hold the lock and starve every
        other request (it only delays its own connection). ``deadline_s``
        evicts the stream at the next chunk boundary with a RequestTimeout
        (surfaced as the terminal SSE error event).
        """
        import jax.numpy as jnp

        from paligemma_tpu import generation

        inputs = self.processor(text=[prompt], images=[image])
        ids = jnp.asarray(inputs["input_ids"])
        dtype = self._act_dtype()
        pix = jnp.asarray(inputs["pixel_values"], dtype)

        chunks: "queue.Queue" = queue.Queue()
        SENTINEL = object()
        cancel = threading.Event()  # set when the SSE client goes away
        deadline = time.time() + deadline_s if deadline_s else None

        def worker():
            try:
                with self.lock:
                    for piece in generation.generate_chunked_stream(
                        self.params, self.cfg, ids, pix,
                        max_new_tokens=max_tokens,
                        eos_token_id=self.processor.tokenizer.eos_token_id,
                        do_sample=do_sample, temperature=temperature,
                        top_p=top_p, cache_dtype=dtype,
                    ):
                        chunks.put(piece)
                        if cancel.is_set():
                            # Client disconnected: stop decoding now so one
                            # abandoned long-max_tokens stream does not hold
                            # the engine lock against every other request.
                            break
                        if deadline is not None and time.time() > deadline:
                            raise RequestTimeout(deadline_s)
                chunks.put(SENTINEL)
            except Exception as e:  # surfaced to the consumer
                chunks.put(e)

        threading.Thread(target=worker, daemon=True).start()

        seen: list = []
        prev_text = ""
        try:
            while True:
                piece = chunks.get()
                if piece is SENTINEL:
                    return
                if isinstance(piece, Exception):
                    raise piece
                seen.extend(piece)
                # Re-decode the prefix each time: byte-level/UTF-8 tokenizers
                # can only produce stable text at whole-sequence granularity.
                text = self.processor.tokenizer.decode(seen, skip_special_tokens=True)
                yield piece, text[len(prev_text):]
                prev_text = text
        finally:
            # Consumer gone (BrokenPipeError in the handler closes this
            # generator) or finished: either way, release the worker.
            cancel.set()


class Batcher:
    """Micro-batching: coalesces concurrent /generate requests within a time
    window into one padded batch through ``serving.batch_generate``.

    Weight streaming dominates single-stream decode; batching amortizes it
    (batch 8 measured ~7.7x the aggregate throughput at 3B). Requests with
    differing sampling params still batch — greedy/temperature/top_p must
    match the first request of the window to join it; mismatches run in the
    next window.
    """

    def __init__(self, engine: Engine, window_ms: float, max_batch: int = 8,
                 queue_depth: int = 64, deadline_s=None):
        self.engine = engine
        self.window = window_ms / 1000.0
        self.max_batch = max_batch
        self.deadline_s = deadline_s if deadline_s else None
        # Bounded: a full queue rejects with 429 instead of growing without
        # limit (the round-2 review flagged the unbounded request path).
        self.queue: "queue.Queue" = queue.Queue(maxsize=queue_depth)
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def submit(self, request: dict) -> dict:
        """Blocks until the batched result for this request is ready."""
        done = threading.Event()
        slot = {
            "request": request, "event": done, "result": None,
            "deadline": time.time() + self.deadline_s if self.deadline_s else None,
        }
        try:
            self.queue.put_nowait(slot)
        except queue.Full:
            raise ServerOverloaded(self.queue.maxsize) from None
        done.wait()
        if isinstance(slot["result"], Exception):
            raise slot["result"]
        return slot["result"]

    def _key(self, r):
        return (r["max_tokens"], r["temperature"], r["top_p"], r["do_sample"])

    def _loop(self):
        import time as _time

        pending: list = []
        while True:
            if not pending:
                pending.append(self.queue.get())
            deadline = _time.time() + self.window
            while len(pending) < self.max_batch:
                timeout = deadline - _time.time()
                if timeout <= 0:
                    break
                try:
                    pending.append(self.queue.get(timeout=timeout))
                except queue.Empty:
                    break
            # Evict requests whose deadline passed while queued: they get a
            # 504 without ever occupying a batch slot. (Once a batch is
            # running it runs to completion — at most max_tokens chunks.)
            now = _time.time()
            expired = [s for s in pending
                       if s["deadline"] is not None and now > s["deadline"]]
            for s in expired:
                s["result"] = RequestTimeout(self.deadline_s)
                s["event"].set()
            pending = [s for s in pending if s not in expired]
            if not pending:
                continue
            # Take the largest same-params prefix group; defer the rest.
            head_key = self._key(pending[0]["request"])
            group = [s for s in pending if self._key(s["request"]) == head_key]
            pending = [s for s in pending if self._key(s["request"]) != head_key]
            self._run(group)

    PROMPT_BUCKET = 64  # pad shapes to buckets: one compile per bucket combo
    BATCH_BUCKET = 4

    def _run(self, group):
        from paligemma_tpu import serving

        try:
            reqs = [s["request"] for s in group]
            r0 = reqs[0]
            with self.engine.lock:
                texts, token_rows = serving.batch_generate(
                    self.engine.params, self.engine.cfg, self.engine.processor,
                    [r["prompt"] for r in reqs],
                    [r["image"] for r in reqs],
                    max_new_tokens=r0["max_tokens"],
                    do_sample=r0["do_sample"],
                    temperature=r0["temperature"],
                    top_p=r0["top_p"],
                    cache_dtype=self.engine._act_dtype(),
                    prompt_bucket=self.PROMPT_BUCKET,
                    batch_bucket=min(self.BATCH_BUCKET, self.max_batch),
                    return_tokens=True,
                )
            for slot, req, text, toks in zip(group, reqs, texts, token_rows):
                slot["result"] = {
                    "text": req["prompt"] + text,
                    "tokens": toks,
                    "num_tokens": len(toks),
                    "batched_with": len(group),
                }
                slot["event"].set()
        except Exception as e:  # pragma: no cover
            for slot in group:
                slot["result"] = e
                slot["event"].set()


class ContinuousRunner:
    """Slot-level continuous batching behind /generate.

    Unlike ``Batcher`` (which coalesces a window, then runs the whole batch to
    its last EOS — mixed-length traffic convoys behind the longest request),
    this keeps ``paligemma_tpu.continuous.ContinuousBatcher``'s decode slots
    permanently hot: a request joins between decode chunks the moment a slot
    frees up and leaves on its own EOS. Per-request sampling params ride the
    slot arrays, so greedy and sampled requests share the one compiled
    program.

    Exposes the same blocking ``submit(request) -> dict`` surface as Batcher.
    """

    def __init__(self, engine: Engine, n_slots: int = 4, chunk: int = 8,
                 max_new_cap: int = 256, prompt_extra=(64,),
                 lora_rank=None, adapters=None, prefill_cache=0,
                 queue_depth: int = 64, deadline_s=None, spec_k: int = 0,
                 spec_adaptive: bool = True, spec_max_slots=None,
                 spec_chunk=None, spec_ks=None, spec_drafter: str = "ngram",
                 kv_quant: bool = False, kv_window: bool = False,
                 metrics: Metrics = None):
        from paligemma_tpu.continuous import ContinuousBatcher

        self.engine = engine
        n_img = engine.cfg.vision_config.num_image_tokens
        self.max_new_cap = max_new_cap
        self.metrics = metrics or Metrics()
        if isinstance(prompt_extra, int):
            prompt_extra = (prompt_extra,)
        self.batcher = ContinuousBatcher(
            engine.params, engine.cfg, engine.processor,
            n_slots=n_slots, chunk=chunk,
            prompt_budget=[n_img + e for e in prompt_extra],
            max_new_tokens=max_new_cap,
            cache_dtype=engine._act_dtype(),
            lora_rank=lora_rank,
            prefill_cache_size=prefill_cache,
            spec_k=spec_k,
            spec_ks=spec_ks,
            spec_adaptive=spec_adaptive,
            spec_max_slots=spec_max_slots,
            # Adaptive default: spec chunks at the measured-best verify
            # cadence — chunk/2 iterations (16 at the 32-step peak; the r4
            # cadence sweep: 8→1744.6, 16→1944.4, 24→1846, 32→1766.7 useful
            # tok/s for k=4, same peak shape for k=8) — while plain chunks
            # keep the full `chunk` cadence.
            spec_chunk=spec_chunk or (
                max(1, chunk // 2)
                if ((spec_k or spec_ks) and spec_adaptive) else None
            ),
            kv_quant=kv_quant,
            kv_window=kv_window,
            spec_drafter=spec_drafter,
        )
        # Multi-tenant LoRA: {name: (adapter_tree, scale)} registered once;
        # requests pick one by name ("adapter" field).
        self.adapters = sorted(adapters) if adapters else []
        for name, (tree, scale) in (adapters or {}).items():
            self.batcher.register_adapter(name, tree, scale)
        # Bounded: a full queue rejects with 429 instead of growing without
        # limit (round-2 review: no unbounded queue on the request path).
        self.queue: "queue.Queue" = queue.Queue(maxsize=queue_depth)
        self.deadline_s = deadline_s if deadline_s else None
        self.waiters = {}  # continuous Request.id -> handler slot dict
        self._emitted = 0  # index into batcher.completed already delivered
        threading.Thread(target=self._loop, daemon=True).start()

    def _new_slot(self, request: dict, **extra) -> dict:
        slot = {
            "request": request, "event": threading.Event(), "result": None,
            "deadline": time.time() + self.deadline_s if self.deadline_s else None,
            **extra,
        }
        try:
            self.queue.put_nowait(slot)
        except queue.Full:
            raise ServerOverloaded(self.queue.maxsize) from None
        return slot

    def submit(self, request: dict) -> dict:
        slot = self._new_slot(request)
        # The engine loop delivers deadline evictions at chunk boundaries;
        # the extra grace here only guards against a wedged backend, so the
        # handler thread can never hang forever once deadlines are on.
        grace = self.deadline_s * 2 + 120 if self.deadline_s else None
        if not slot["event"].wait(timeout=grace):
            slot["cancelled"] = True
            creq = slot.get("creq")
            if creq is not None:
                creq.cancelled = True
            self.metrics.inc("evictions_wedged")
            raise RequestTimeout(self.deadline_s)
        if isinstance(slot["result"], Exception):
            raise slot["result"]
        return slot["result"]

    def submit_stream(self, prompt, image, max_tokens, temperature, top_p,
                      do_sample, adapter=None):
        """Yields (new_tokens, text_delta) per decode chunk — same surface as
        Engine.generate_stream, but multiplexed over the continuous slots so
        MANY streams decode concurrently instead of serializing on the
        engine lock."""
        chunks: "queue.Queue" = queue.Queue()
        slot = self._new_slot(
            {
                "prompt": prompt, "image": image, "max_tokens": max_tokens,
                "temperature": temperature, "top_p": top_p,
                "do_sample": do_sample, "adapter": adapter,
            },
            stream_q=chunks,
        )

        tok = self.engine.processor.tokenizer
        seen, prev_text = [], ""
        try:
            while True:
                piece, done = chunks.get()
                if isinstance(piece, Exception):
                    raise piece
                if piece:
                    seen.extend(piece)
                    # Re-decode the prefix each time: byte/UTF-8 tokenizers
                    # only produce stable text at whole-sequence granularity.
                    text = tok.decode(seen, skip_special_tokens=True)
                    yield piece, text[len(prev_text):]
                    prev_text = text
                if done:
                    return
        finally:
            # Consumer gone (the SSE handler closes this generator on
            # BrokenPipeError) or finished: free the slot at the next chunk.
            slot["cancelled"] = True
            creq = slot.get("creq")
            if creq is not None:
                creq.cancelled = True

    def _loop(self):
        while True:
            # Block when idle; otherwise just drain whatever arrived while
            # the last chunk was decoding.
            idle = (
                not any(r is not None for r in self.batcher.slot_req)
                and not self.batcher.pending
            )
            items = [self.queue.get()] if idle else []
            while True:
                try:
                    items.append(self.queue.get_nowait())
                except queue.Empty:
                    break
            now = time.time()
            for slot in items:
                req = slot["request"]
                if slot["deadline"] is not None and now > slot["deadline"]:
                    # Expired while queued: 504 without occupying a slot.
                    self.metrics.inc("evictions_queued")
                    err = RequestTimeout(self.deadline_s)
                    sq = slot.get("stream_q")
                    if sq is not None:
                        sq.put((err, True))
                    else:
                        slot["result"] = err
                        slot["event"].set()
                    continue
                try:
                    creq = self.batcher.submit(
                        req["prompt"], req["image"],
                        min(req["max_tokens"], self.max_new_cap),
                        temperature=req.get("temperature"),
                        top_p=req.get("top_p"),
                        do_sample=req.get("do_sample"),
                        adapter=req.get("adapter"),
                    )
                    sq = slot.get("stream_q")
                    if sq is not None:
                        # Deliver the request's error (join failure, engine
                        # fault) THROUGH the stream: the generator raises it
                        # instead of ending as a silent empty 200.
                        def _notify(toks, done, _q=sq, _r=creq):
                            if done and _r.error is not None:
                                _q.put((_r.error, True))
                            else:
                                _q.put((toks, done))

                        creq.on_tokens = _notify
                    slot["creq"] = creq
                    if slot.get("cancelled"):
                        creq.cancelled = True
                    self.waiters[creq.id] = slot
                except Exception as e:
                    sq = slot.get("stream_q")
                    if sq is not None:
                        sq.put((e, True))
                    else:
                        slot["result"] = e
                        slot["event"].set()

            # Mid-flight deadline eviction: a request past its wall-clock
            # budget is cancelled (its decode slot frees at the next chunk
            # boundary) and the waiter gets a 504 instead of partial output.
            if self.deadline_s:
                now = time.time()
                for slot in list(self.waiters.values()):
                    creq = slot.get("creq")
                    if (creq is not None and not creq.done
                            and slot["deadline"] is not None
                            and now > slot["deadline"]
                            and creq.error is None):
                        self.metrics.inc("evictions_deadline")
                        creq.error = RequestTimeout(self.deadline_s)
                        creq.cancelled = True

            active = 0
            t0 = time.time()
            toks0 = self.batcher.tokens_delivered
            try:
                with self.engine.lock:
                    active = sum(r is not None for r in self.batcher.slot_req)
                    self.batcher.step()
                self.metrics.observe_chunk(
                    self.batcher.tokens_delivered - toks0, time.time() - t0
                )
            except Exception as e:
                # A transient engine/backend fault (the tunneled TPU RPC is
                # known to occasionally fail) must not kill this thread —
                # every waiter would hang forever. Fail the in-flight
                # requests, free the slots, keep serving.
                for i, creq in enumerate(self.batcher.slot_req):
                    if creq is not None:
                        creq.error = e
                        creq.done = True
                        self.batcher.completed.append(creq)
                        if creq.on_tokens is not None:
                            creq.on_tokens([], True)
                        self.batcher.slot_req[i] = None
            # Deliver newly completed requests.
            comp = self.batcher.completed
            while self._emitted < len(comp):
                creq = comp[self._emitted]
                self._emitted += 1
                slot = self.waiters.pop(creq.id, None)
                if slot is None:
                    continue
                if slot.get("stream_q") is not None:
                    # Streamed: chunks (and any error) were already delivered
                    # through the on_tokens hook.
                    continue
                if creq.error is not None:
                    slot["result"] = creq.error
                else:
                    text = self.batcher.decode_text(creq)
                    slot["result"] = {
                        "text": slot["request"]["prompt"] + text,
                        "tokens": creq.tokens,
                        "num_tokens": len(creq.tokens),
                        "continuous": True,
                        "batched_with": active,
                    }
                slot["event"].set()


# Self-contained browser UI (the reference ships a Streamlit app, app.py;
# this needs no extra dependency — upload an image, stream the answer).
INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>PaliGemma Analyzer (TPU)</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:640px;margin:2rem auto;padding:0 1rem}
 textarea,input,button{font:inherit;width:100%;box-sizing:border-box;margin:.25rem 0}
 #out{white-space:pre-wrap;border:1px solid #ccc;border-radius:6px;padding:.75rem;
      min-height:4rem;background:#fafafa}
 img{max-width:200px;display:block;margin:.5rem 0}
 .row{display:flex;gap:.5rem}.row>*{flex:1}
</style></head><body>
<h2>PaliGemma Analyzer (TPU)</h2>
<input type="file" id="img" accept="image/*">
<img id="preview" hidden>
<textarea id="prompt" rows="2">Describe the image</textarea>
<div class="row">
 <label>max tokens <input id="maxtok" type="number" value="100"></label>
 <label>temperature <input id="temp" type="number" step="0.1" value="0.8"></label>
 <label>top-p <input id="topp" type="number" step="0.05" value="0.9"></label>
 <label>sample <input id="sample" type="checkbox" style="width:auto"></label>
</div>
<label id="adrow" hidden>adapter
 <select id="adapter"><option value="">(base model)</option></select></label>
<button id="go">Analyze</button>
<h3>PaliGemma Insight</h3><div id="out"></div>
<script>
let b64=null;
// Registered LoRA adapters (server --adapter NAME=DIR) populate a selector.
fetch('/healthz').then(r=>r.json()).then(h=>{
 if(h.adapters&&h.adapters.length){
  for(const a of h.adapters){const o=document.createElement('option');
   o.value=a;o.textContent=a;adapter.appendChild(o);}
  adrow.hidden=false;}}).catch(()=>{});
img.onchange=()=>{const f=img.files[0];const r=new FileReader();
 r.onload=()=>{b64=r.result.split(',')[1];preview.src=r.result;preview.hidden=false};
 r.readAsDataURL(f);};
go.onclick=async()=>{
 if(!b64){out.textContent='upload an image first';return}
 out.textContent='';go.disabled=true;
 const body=JSON.stringify({prompt:prompt.value,image_b64:b64,
   max_tokens:+maxtok.value,temperature:+temp.value,top_p:+topp.value,
   do_sample:sample.checked,adapter:adapter.value||null});
 const resp=await fetch('/generate_stream',{method:'POST',body,
   headers:{'Content-Type':'application/json'}});
 if(!resp.ok){out.textContent='error: '+await resp.text();go.disabled=false;return}
 const reader=resp.body.getReader();const dec=new TextDecoder();let buf='';
 for(;;){const {done,value}=await reader.read();if(done)break;
  buf+=dec.decode(value,{stream:true});
  let i;while((i=buf.indexOf('\\n\\n'))>=0){const line=buf.slice(0,i);buf=buf.slice(i+2);
   if(line.startsWith('data: ')){const ev=JSON.parse(line.slice(6));
    if(ev.text_delta)out.textContent+=ev.text_delta;}}}
 go.disabled=false;};
</script></body></html>"""


def make_handler(engine: Engine, batcher=None, admission: Admission = None,
                 metrics: Metrics = None):
    admission = admission or Admission()
    metrics = metrics or Metrics()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload, headers=None):
            metrics.inc(f"http_{code}")
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _metrics_payload(self):
            m = metrics.snapshot()
            m["in_flight"] = admission._n
            m["queue_depth_max"] = admission.depth
            m["mode"] = (
                "continuous" if isinstance(batcher, ContinuousRunner)
                else "batched" if batcher is not None else "single"
            )
            if isinstance(batcher, ContinuousRunner):
                b = batcher.batcher
                m.update(
                    slots_total=b.n_slots,
                    slots_occupied=sum(
                        r is not None for r in b.slot_req),
                    engine_queue=len(b.pending) + batcher.queue.qsize(),
                    requests_completed=len(b.completed),
                    tokens_delivered=b.tokens_delivered,
                    chunks_run=b.chunks_run,
                    prefill_cache_hits=b.prefill_cache_hits,
                    staged_upload_hits=b.staged_hits,
                    staged_upload_misses=b.staged_misses,
                    pixel_affine=b.pixel_affine,
                )
                if b.spec_k:
                    log = b.spec_mode_log
                    klog = b.spec_k_log
                    m.update(
                        spec_k=b.spec_k,
                        spec_ks=list(b.spec_ks),
                        spec_rung_k=b.spec_ks[b._spec_rung],
                        spec_adaptive=b.spec_adaptive,
                        spec_verifies=b.spec_verifies,
                        spec_emitted=b.spec_emitted,
                        spec_chunks=sum(log),
                        plain_chunks=len(log) - sum(log),
                        spec_k_chunks={
                            str(k): sum(1 for x in klog if x == k)
                            for k in b.spec_ks
                        },
                    )
                    if b.spec_accept_ema is not None:
                        m["spec_accept_ema"] = round(b.spec_accept_ema, 3)
                if b.window_buckets:
                    m.update(
                        kv_window=b.window,
                        kv_window_buckets=list(b.window_buckets),
                        kv_window_resizes=b.window_resizes,
                    )
            return m

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                info = {
                    "status": "ok",
                    "model": engine.model_name,
                    "device": str(jax.devices()[0]),
                }
                if isinstance(batcher, ContinuousRunner):
                    info["adapters"] = batcher.adapters
                self._send(200, info)
            elif self.path == "/metrics":
                self._send(200, self._metrics_payload())
            elif self.path in ("/", "/index.html"):
                body = INDEX_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path not in ("/generate", "/generate_stream"):
                return self._send(404, {"error": f"unknown path {self.path}"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                prompt = req["prompt"]
                if not isinstance(prompt, str):
                    raise ValueError("prompt must be a string")
                params = dict(
                    max_tokens=int(req.get("max_tokens", 100)),
                    temperature=float(req.get("temperature", 0.8)),
                    top_p=float(req.get("top_p", 0.9)),
                    do_sample=bool(req.get("do_sample", False)),
                )
                if params["max_tokens"] < 1:
                    raise ValueError("max_tokens must be >= 1")
                adapter = req.get("adapter")
                if adapter is not None:
                    # Multi-tenant LoRA rides the continuous slots only;
                    # validate here so a bad name is a 400, while engine-side
                    # join failures remain 500s.
                    if not isinstance(batcher, ContinuousRunner):
                        raise ValueError(
                            "adapter requires the server to run with "
                            "--continuous (and --adapter NAME=DIR)"
                        )
                    if adapter not in batcher.adapters:
                        raise ValueError(
                            f"unknown adapter {adapter!r}; registered: "
                            f"{batcher.adapters}"
                        )
                    params["adapter"] = str(adapter)
                from PIL import Image

                image = Image.open(
                    io.BytesIO(base64.b64decode(req["image_b64"]))
                ).convert("RGB")
            except (KeyError, ValueError, TypeError, json.JSONDecodeError) as e:
                return self._send(400, {"error": f"bad request: {e!r}"})
            except Exception as e:
                return self._send(400, {"error": f"bad image: {e!r}"})

            if self.path == "/generate_stream":
                return self._stream(prompt, image, params)

            try:
                with admission.slot():
                    if batcher is not None:
                        out = batcher.submit(
                            {"prompt": prompt, "image": image, **params}
                        )
                    else:
                        out = engine.generate(
                            prompt, image, **params,
                            deadline_s=admission.deadline_s,
                        )
                self._send(200, out)
            except ServerOverloaded as e:
                self._send(429, {"error": str(e)}, headers={"Retry-After": "1"})
            except RequestTimeout as e:
                self._send(504, {"error": str(e)})
            except Exception as e:  # surfacing engine errors as 500s
                self._send(500, {"error": repr(e)})

        def _stream(self, prompt, image, params):
            """Server-Sent Events: one event per compiled decode chunk.

            In continuous mode, streams multiplex over the decode slots —
            many clients stream concurrently instead of serializing on the
            engine lock."""
            try:
                ctx = admission.slot()
                ctx.__enter__()
            except ServerOverloaded as e:
                return self._send(429, {"error": str(e)},
                                  headers={"Retry-After": "1"})
            try:
                try:
                    if isinstance(batcher, ContinuousRunner):
                        gen = batcher.submit_stream(prompt, image, **params)
                    else:
                        gen = engine.generate_stream(
                            prompt, image, **params,
                            deadline_s=admission.deadline_s,
                        )
                    first = next(gen)  # run prefill before committing to 200
                except StopIteration:
                    first = None
                    gen = iter(())
                except ServerOverloaded as e:
                    return self._send(429, {"error": str(e)},
                                      headers={"Retry-After": "1"})
                except RequestTimeout as e:
                    return self._send(504, {"error": str(e)})
                except Exception as e:
                    return self._send(500, {"error": repr(e)})

                metrics.inc("http_200_stream")
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.end_headers()
                total = 0

                def emit(piece, delta):
                    nonlocal total
                    total += len(piece)
                    payload = json.dumps({"tokens": piece, "text_delta": delta})
                    self.wfile.write(f"data: {payload}\n\n".encode())
                    self.wfile.flush()

                try:
                    if first is not None:
                        emit(*first)
                    for piece, delta in gen:
                        emit(piece, delta)
                    self.wfile.write(
                        f"data: {json.dumps({'done': True, 'num_tokens': total})}\n\n".encode()
                    )
                    self.wfile.flush()
                except (BrokenPipeError, ConnectionResetError):
                    pass  # client went away mid-stream
                except Exception as e:
                    # Mid-stream failure (e.g. a deadline eviction) after the
                    # 200 committed: surfaced as a terminal SSE error event.
                    try:
                        payload = json.dumps({"error": str(e), "done": True})
                        self.wfile.write(f"data: {payload}\n\n".encode())
                        self.wfile.flush()
                    except (BrokenPipeError, ConnectionResetError):
                        pass
            finally:
                ctx.__exit__(None, None, None)

        def log_message(self, fmt, *args):  # route to stderr, keep stdout clean
            print(f"[server] {fmt % args}", file=sys.stderr)

    return Handler


def _spec_config(args):
    """Resolve --spec_k / --spec_ks into (spec_k, spec_ks) engine params.

    --spec_k given: a single fixed draft depth (0 disables speculation;
    1 is rejected — it would silently serve plain at the plain peak).
    Otherwise the --spec_ks ladder — adaptive engines get the full rung
    list; with --spec_adaptive off the deepest rung runs statically (a
    multi-rung ladder needs the adaptive policy to pick the rung)."""
    if args.spec_k is not None:
        if args.spec_k == 1:
            raise SystemExit(
                "--spec_k must be 0 (off) or >= 2 (1+ draft tokens)")
        return args.spec_k, None
    ks = tuple(sorted({int(x) for x in args.spec_ks.split(",") if x.strip()}))
    if not ks:
        return 0, None
    if args.spec_adaptive != "on":
        return ks[-1], None
    return 0, ks


def _kv_window_enabled(args) -> bool:
    """Resolve --kv_window {on,off,auto}: 'auto' enables the occupancy-
    bounded cache window exactly when adaptive speculation is active, where
    it measured +5.5% (vs -5% under the plain program — REPORT.md round 4).
    """
    if args.kv_window == "on":
        return True
    spec_k, spec_ks = _spec_config(args)
    return (args.kv_window == "auto" and bool(spec_k or spec_ks)
            and args.spec_adaptive == "on")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--demo", action="store_true")
    p.add_argument("--only_cpu", action="store_true")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch_window_ms", type=float, default=0.0,
                   help=">0: coalesce concurrent /generate requests into one "
                        "padded batch within this window")
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--continuous", action="store_true",
                   help="slot-level continuous batching: requests join the "
                        "running decode between chunks and leave on EOS; "
                        "per-request sampling params ride the slots, so "
                        "greedy and sampled traffic share one program")
    p.add_argument("--n_slots", type=int, default=32,
                   help="continuous mode: decode batch width. Default is the "
                        "measured single-chip throughput peak (int8, 32 "
                        "slots, chunk 32: 1410.8 useful tok/s on the "
                        "256-request backlogged mixed-length workload; 48 "
                        "slots is flat — REPORT.md round 3). Lower it on "
                        "small boxes.")
    p.add_argument("--chunk", type=int, default=32,
                   help="continuous mode: decode steps per dispatch — the "
                        "streaming-latency vs dispatch-amortization knob "
                        "(8 streams snappily; 32 is the measured throughput "
                        "peak, REPORT.md)")
    p.add_argument("--max_new_cap", type=int, default=256,
                   help="continuous mode: per-slot token budget (cache is "
                        "sized statically for it)")
    p.add_argument("--lora_rank", type=int, default=None,
                   help="continuous mode: enable multi-tenant LoRA serving "
                        "at this (max) adapter rank")
    p.add_argument("--adapter", action="append", default=[],
                   metavar="NAME=DIR",
                   help="register a LoRA adapter directory (saved by the "
                        "finetune path) under NAME; repeatable; requests "
                        "select one with the 'adapter' field")
    p.add_argument("--quant", choices=["none", "int8", "w4a8"], default="none",
                   help="w4a8: int4 MLP weights + int8 activations, one "
                        "fused Pallas kernel per layer (fastest measured "
                        "single-stream decode, int4_bench.json); "
                        "int8: weight-only quantized decoder — the measured "
                        "production serving config (272.7 tok/s single-"
                        "stream vs 143 bf16 at 3B on v5e-1, REPORT.md)")
    def _buckets(spec: str):
        vals = tuple(int(x) for x in spec.split(",") if x.strip())
        if not vals or any(v < 1 for v in vals):
            raise argparse.ArgumentTypeError(
                f"expected comma-separated positive ints, got {spec!r}"
            )
        return vals

    p.add_argument("--prompt_buckets", type=_buckets, default=(64,),
                   help="continuous mode: comma-separated TEXT-token budgets "
                        "(on top of the image tokens); a join group prefills "
                        "at the smallest bucket covering its prompts, so "
                        "long prompts work without making short ones pay "
                        "for them")
    p.add_argument("--queue_depth", type=int, default=64,
                   help="max in-flight requests (queued + running); the "
                        "(depth+1)-th gets 429 + Retry-After instead of "
                        "waiting on an unbounded queue")
    p.add_argument("--request_timeout_s", type=float, default=120.0,
                   help="per-request wall-clock deadline; exceeding it "
                        "evicts the request (decode slot freed at the next "
                        "chunk boundary) with a 504; 0 disables")
    p.add_argument("--spec_k", type=int, default=None,
                   help="continuous mode, >=2: per-slot n-gram speculative "
                        "decoding as a SINGLE fixed draft depth — greedy "
                        "requests emit up to k exact tokens per verify at "
                        "the workload's acceptance rate; sampled slots draw "
                        "the exact plain-sampling distribution. Default: "
                        "unset, which ships the --spec_ks ladder instead. "
                        "0 disables speculation entirely.")
    p.add_argument("--spec_ks", type=str, default="8",
                   help="continuous mode with --spec_adaptive: the "
                        "draft-depth LADDER — comma-separated ascending k "
                        "rungs the adaptive policy may run. Default '8' "
                        "(a single rung): measured 2273-2492/4922-5296 "
                        "useful tok/s std/long at 32 slots vs 1413/1877 "
                        "plain, and k=8 "
                        "dominates k=4 at every measured acceptance, so "
                        "multi-rung ladders only add rung-oscillation "
                        "cost (REPORT.md round 4). Low acceptance demotes "
                        "to plain chunks (break-even EMA 2.0) with "
                        "exponentially backed-off probes, so the floor is "
                        "the plain peak. Ignored when --spec_k is given")
    p.add_argument("--spec_drafter", choices=["ngram", "longest"],
                   default="ngram",
                   help="draft proposal rule: fixed (n-1)-gram recency "
                        "match (shipped default), or longest-common-suffix "
                        "variable-context match — higher acceptance on "
                        "structured low-repetition text, same exactness")
    p.add_argument("--spec_adaptive", choices=["on", "off"], default="on",
                   help="with --spec_k: choose per chunk between the "
                        "speculative and plain programs from occupancy + "
                        "acceptance EMA (spec wins at narrow widths, plain "
                        "at the 32-slot peak — REPORT.md); off = always "
                        "speculate")
    p.add_argument("--spec_max_slots", type=int, default=None,
                   help="adaptive speculation: occupied-slot count above "
                        "which chunks run the plain program (default: no "
                        "gate — the shipped k=8 verify wins at full "
                        "32-slot width, REPORT.md r4; set a bound for "
                        "custom shallow-k or wider-slot configs)")
    p.add_argument("--spec_chunk", type=int, default=None,
                   help="verify iterations per SPECULATIVE chunk (default: "
                        "chunk/spec_k under --spec_adaptive, else chunk)")
    p.add_argument("--kv_quant", choices=["on", "off"], default="off",
                   help="continuous mode: int8 KV cache (per-row scales, "
                        "dequant fused into the attention read) — halves the "
                        "per-step K/V streaming; greedy fidelity pinned "
                        "empirically (REPORT.md)")
    p.add_argument("--kv_window", choices=["on", "off", "auto"],
                   default="auto",
                   help="continuous mode: occupancy-bounded cache window — "
                        "the live cache is kept at the smallest bucket "
                        "covering every occupied slot, so chunks stop "
                        "streaming unwritten tail slots. 'auto' (default) "
                        "enables it exactly when adaptive speculation is "
                        "active (spec_k>=2 + spec_adaptive): measured "
                        "+5.5%% there (1742.6 vs 1651.9 useful tok/s at 32 "
                        "slots — the verify program streams the cache "
                        "hardest) but -5%% under the plain program "
                        "(REPORT.md round 4)")
    p.add_argument("--prefill_a8", choices=["on", "off"], default="off",
                   help="both-operands-int8 MXU prefill projections "
                        "(requires --quant int8). Opt-in: trades exact "
                        "bf16-token parity for prefill throughput — see "
                        "REPORT.md a8 section before enabling")
    p.add_argument("--prefill_cache", type=int, default=0,
                   help="continuous mode: LRU size of the content-keyed "
                        "prefix cache — repeated identical (prompt, image, "
                        "adapter) requests skip the vision tower + prefill "
                        "(~11 MB HBM per entry at 3B/288)")
    args = p.parse_args(argv)

    if args.only_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.prefill_a8 == "on" and args.quant not in ("int8", "w4a8"):
        raise SystemExit("--prefill_a8 on requires --quant int8 or w4a8")
    from paligemma_tpu import runtime

    # CLI is authoritative (set before warm-up traces anything): an explicit
    # or default "off" must also override a stray PALIGEMMA_PREFILL_A8=1 env.
    runtime.set_prefill_a8(args.prefill_a8 == "on")

    engine = Engine(
        args.model_path, demo=args.demo or not args.model_path,
        quant=args.quant,
    )
    metrics = Metrics()

    # Warm-up: pay the jit compiles before accepting traffic so the first
    # request is fast.
    try:
        from PIL import Image

        size = engine.cfg.vision_config.image_size
        engine.generate(
            "warmup", Image.new("RGB", (size, size)), 4, 0.0, 0.9, False
        )
        print("warm-up complete", file=sys.stderr, flush=True)
    except Exception as e:  # pragma: no cover
        print(f"warm-up failed: {e!r}", file=sys.stderr, flush=True)

    if args.continuous:
        adapters = {}
        lora_rank = args.lora_rank
        for spec in args.adapter:
            name, _, path = spec.partition("=")
            if not path:
                raise SystemExit(f"--adapter expects NAME=DIR, got {spec!r}")
            from paligemma_tpu.lora import load_adapter

            tree = load_adapter(path)
            layers = tree["layers"] if "layers" in tree else tree
            r = int(layers["q"]["a"].shape[-1])
            scale = 1.0
            import os

            cfg_path = os.path.join(path, "adapter_config.json")
            if os.path.exists(cfg_path):
                with open(cfg_path) as f:
                    acfg = json.load(f)
                scale = float(acfg.get("lora_alpha", r)) / float(acfg.get("r", r))
            adapters[name] = (tree, scale)
            lora_rank = max(lora_rank or 0, r)
        spec_k_arg, spec_ks_arg = _spec_config(args)
        batcher = ContinuousRunner(
            engine, n_slots=args.n_slots, chunk=args.chunk,
            max_new_cap=args.max_new_cap,
            prompt_extra=args.prompt_buckets,
            lora_rank=lora_rank, adapters=adapters,
            prefill_cache=args.prefill_cache,
            queue_depth=args.queue_depth,
            # Deadline armed AFTER warm-up: the warm-up requests themselves
            # pay multi-minute remote compiles and must not be evicted.
            deadline_s=None,
            spec_k=spec_k_arg,
            spec_ks=spec_ks_arg,
            spec_adaptive=args.spec_adaptive == "on",
            spec_max_slots=args.spec_max_slots,
            spec_chunk=args.spec_chunk,
            spec_drafter=args.spec_drafter,
            kv_quant=args.kv_quant == "on",
            kv_window=_kv_window_enabled(args),
            metrics=metrics,
        )
        # Warm the slot programs (bucketed prefill + slot decode + insert)
        # for EVERY prompt bucket — a shape compiled mid-traffic stalls all
        # active slots for minutes on the remote-compile backend. The prompt
        # lengths are best-effort (exact for the byte tokenizer, approximate
        # for subword tokenizers).
        try:
            from PIL import Image

            size = engine.cfg.vision_config.image_size
            for extra in args.prompt_buckets:
                req = {
                    "prompt": "w" * max(1, extra - 2),
                    "image": Image.new("RGB", (size, size)),
                    "max_tokens": 8, "temperature": 0.0, "top_p": 0.9,
                    "do_sample": False,
                }
                batcher.submit(dict(req))  # batch-1 join shape
                # Group-join shape (batch n_slots): concurrent submits into
                # an idle engine join as one group (best-effort — the loop
                # drains the queue in one gulp when they enqueue together;
                # a straggler just reuses the already-warm batch-1 shape).
                ts = [
                    threading.Thread(target=batcher.submit, args=(dict(req),))
                    for _ in range(args.n_slots)
                ]
                for t in ts:
                    t.start()
                for t in ts:
                    t.join()
            print("continuous warm-up complete "
                  f"({len(args.prompt_buckets)} bucket(s), solo + group "
                  "join shapes)", file=sys.stderr, flush=True)
        except Exception as e:  # pragma: no cover
            print(f"continuous warm-up failed: {e!r}", file=sys.stderr, flush=True)
    else:
        batcher = (
            Batcher(engine, args.batch_window_ms, args.max_batch,
                    queue_depth=args.queue_depth, deadline_s=None)
            if args.batch_window_ms > 0
            else None
        )
    if batcher is not None and not args.continuous:
        # Warm the batched shapes too (bucketed prompt length + batch size)
        # so the first coalesced group doesn't stall on a multi-minute
        # remote compile.
        try:
            from PIL import Image

            size = engine.cfg.vision_config.image_size
            batcher.submit({
                "prompt": "warmup", "image": Image.new("RGB", (size, size)),
                "max_tokens": 8, "temperature": 0.8, "top_p": 0.9,
                "do_sample": False,
            })
            print("batched warm-up complete", file=sys.stderr, flush=True)
        except Exception as e:  # pragma: no cover
            print(f"batched warm-up failed: {e!r}", file=sys.stderr, flush=True)
    # Arm deadlines only now: warm-up (above) paid the compiles, so no real
    # request should ever hit a multi-minute compile stall.
    deadline_s = args.request_timeout_s if args.request_timeout_s > 0 else None
    if batcher is not None:
        batcher.deadline_s = deadline_s
    admission = Admission(depth=args.queue_depth, deadline_s=deadline_s)
    server = ThreadingHTTPServer(
        ("127.0.0.1", args.port),
        make_handler(engine, batcher, admission, metrics),
    )
    print(f"serving on http://127.0.0.1:{args.port}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
