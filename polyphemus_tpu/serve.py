"""Minimal production generation server.

The reference has no serving story (SURVEY.md: CLI scripts only); this is
the framework's deployment surface: load a checkpoint once, keep warm
jitted generators per batch *tier* (1 / 8 / batch_cap by default) so a
single-sequence request doesn't pay the full-batch compute — each request
routes to the smallest tier >= n, pads to it, and slices the outputs.
MIDI renders host-side; HTTP is stdlib (no extra dependencies).

    python -m polyphemus_tpu.cli.serve MODEL_DIR --port 8000

API:
  GET  /healthz (alias: /health)
      -> {"status": "ok", "model": ..., "n_bars": N, "batch_cap": B,
          "tiers": [...]}
  POST /generate   {"n": 4, "seed": 123,
                    "structure": [[...]] optional conditioning tensor,
                    "structure_temp": 0.0, "content_temp": 0.0,
                    "format": "midi" | "tokens"}
      -> {"midi_b64": [...]} (one standard MIDI file per sequence)
         or {"tokens": [...], "mask": [...]} for downstream pipelines.

Device work is serialized with a lock (one chip, one program); MIDI
rendering happens outside the lock. Concurrent requests are COALESCED:
while the device runs one call, compatible queued requests (same
temperatures/conditioning) merge into a single padded tier call —
continuous micro-batching, so 8 concurrent n=1 clients cost ~one tier-8
call instead of eight tier-1 calls. Outputs are uint8-packed on device
(generate.make_generator): the device->host copy rides the tunnel and
dominates per-call cost at large tiers (4x narrower than int32).
Request z is sampled HOST-side (host_z below — a per-request jax op
would queue on the device stream behind the in-flight tier call).
bench_report.json serve_* keys are the measured source of truth
(64-client sustained >= 600 seq/s; PERFORMANCE.md round 5 for the
coalesce-ratio effect and tunnel-variance caveats). Generators are cached per
(tier, temps, conditioned); temperatures are quantized to 2 decimals and
the cache is a bounded LRU, so arbitrary client-supplied floats cannot
grow the compile cache without bound. Cache check-and-insert happens
under the device lock (compilation is serialized with device work anyway).
"""
from __future__ import annotations

import base64
import json
import threading
from collections import OrderedDict, deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence

import numpy as np

# generator-cache bound: tiers (3) x temp pairs x {cond, uncond}
_MAX_CACHED_GENERATORS = 24


class _Work:
    """One pending /generate request inside the coalescer."""
    __slots__ = ("key", "z", "s", "event", "out", "err")

    def __init__(self, key, z, s):
        self.key = key          # (s_temp_q, c_temp_q, conditioned)
        self.z = z              # (n, d) rows for this request
        self.s = s              # (n, ...) structure rows or None
        self.event = threading.Event()
        self.out = None         # (mask[n], tokens[n])
        self.err = None


def host_z(seed: int, n: int, d: int) -> np.ndarray:
    """z ~ N(0, I) sampled HOST-side (numpy PCG64, deterministic per seed).

    The CLI path samples z with jax.random (generate.generate_z); doing
    that per request here was a serving bug found in round 5: the tiny
    normal() kernel + (n, d) readback queue on the single device stream
    BEHIND the in-flight tier call, so every request paid a full
    call-duration before even entering the coalescer — which also made
    requests arrive right after a dispatch and miss the batching window
    (coalesce ratio 1.64 at 8 clients). Host-side sampling keeps the
    device stream exclusively for tier calls. Streams differ from the CLI
    per seed (documented; both are deterministic)."""
    return np.random.default_rng(seed).standard_normal(
        (n, d)).astype(np.float32)


def _quantize_temp(t) -> float:
    """Quantize client floats so the generator-cache key space (and compile
    count) is bounded; 2 decimals is far below audible temperature
    resolution. A positive temperature never quantizes to 0.0 — that would
    silently turn a stochastic request into deterministic argmax."""
    t = float(t)
    if t < 0:
        raise ValueError("temperatures must be >= 0")
    q = round(t, 2)
    if t > 0 and q == 0.0:
        q = 0.01
    return q


class GenerationService:
    """Model + generator cache; independent of the HTTP layer (usable from
    tests or other frontends directly)."""

    def __init__(self, model_dir: str, batch_cap: int = 256,
                 use_pallas: Optional[bool] = None,
                 tiers: Optional[Sequence[int]] = None,
                 coalesce: bool = True):
        import jax

        from . import generate as G

        self.model_dir = model_dir
        self.batch_cap = batch_cap
        # latency tiers: requests pad to the smallest tier >= n, so n=1
        # costs tier-1 compute, not batch_cap compute. batch_cap defaults
        # to the chip's throughput-optimal batch (256, bench.py) so a deep
        # queue coalesces toward full-rate device calls (tier-256 calls
        # run >12k seq/s offline); small tiers below it keep solo-request
        # latency unchanged.
        if tiers is None:
            tiers = [t for t in (1, 8, 64) if t < batch_cap] + [batch_cap]
        self.tiers = sorted(set(int(t) for t in tiers))
        if self.tiers[0] < 1:
            raise ValueError("tiers must be >= 1")
        if self.tiers[-1] != batch_cap:
            raise ValueError("largest tier must equal batch_cap")
        self.model, self.variables, self.cfg = G.load_model(model_dir)
        self.mc = self.cfg.model
        self.pallas = (jax.default_backend() == "tpu"
                       if use_pallas is None else use_pallas)
        self._gens: OrderedDict = OrderedDict()
        self._lock = threading.Lock()
        self._G = G
        # Request coalescing: while the device runs one batch, newly queued
        # compatible requests accumulate and dispatch as ONE padded tier
        # call (continuous micro-batching) instead of one tier-1 call each.
        # Deterministic (temp 0) outputs are row-independent (eval-mode BN),
        # so a coalesced request returns bit-identical results to a solo
        # call; stochastic requests share the call's sampling key, so their
        # noise depends on batch composition (documented, temp>0 only).
        self.coalesce = bool(coalesce)
        # observability: device_calls counts compiled-batch launches,
        # coalesced_requests counts requests that shared a launch
        self.stats = {"device_calls": 0, "requests": 0,
                      "coalesced_requests": 0}
        self._pending: deque = deque()
        self._pending_cv = threading.Condition()
        self._dispatcher: Optional[threading.Thread] = None
        if self.coalesce:
            self._dispatcher = threading.Thread(
                target=self._dispatch_loop, daemon=True,
                name="poly-serve-dispatch")
            self._dispatcher.start()

    def tier_for(self, n: int) -> int:
        for t in self.tiers:
            if n <= t:
                return t
        raise ValueError(f"n must be in [1, {self.batch_cap}]")

    def _generator_locked(self, tier: int, s_temp: float, c_temp: float,
                          conditioned: bool):
        """Caller must hold self._lock."""
        key = (int(tier), _quantize_temp(s_temp), _quantize_temp(c_temp),
               bool(conditioned))
        gen = self._gens.get(key)
        if gen is None:
            gen = self._G.make_generator(
                self.model, self.variables, conditioned=conditioned,
                pallas=self.pallas, structure_temp=key[1],
                content_temp=key[2],
                sample_seed=int(key[1] * 1e3 + key[2]) & 0x7FFFFFFF)
            self._gens[key] = gen
            while len(self._gens) > _MAX_CACHED_GENERATORS:
                self._gens.popitem(last=False)
        else:
            self._gens.move_to_end(key)
        return gen

    def warmup(self, all_tiers: bool = True):
        import jax

        with self._lock:
            for tier in (self.tiers if all_tiers else self.tiers[-1:]):
                z = jax.numpy.zeros((tier, self.mc.d))
                jax.block_until_ready(
                    self._generator_locked(tier, 0.0, 0.0, False)(z))

    def generate(self, n: int, seed: int = 0, structure=None,
                 structure_temp: float = 0.0, content_temp: float = 0.0):
        """Returns (mask, tokens) numpy arrays for n sequences."""
        if not 1 <= n <= self.batch_cap:
            raise ValueError(f"n must be in [1, {self.batch_cap}]")
        z = host_z(seed, n, self.mc.d)
        cond = structure is not None
        s_rows = None
        if cond:
            s = self._G.load_structure_array(
                np.asarray(structure, dtype=bool), self.mc.n_bars,
                self.mc.n_tracks, self.mc.n_timesteps)
            s_rows = np.broadcast_to(s, (n,) + s.shape)
        key = (_quantize_temp(structure_temp), _quantize_temp(content_temp),
               cond)
        if not self.coalesce:
            return self._run_batch(key, z, s_rows, [n])[0]
        work = _Work(key, z, s_rows)
        with self._pending_cv:
            self._pending.append(work)
            self._pending_cv.notify()
        work.event.wait()
        if work.err is not None:
            raise work.err
        return work.out

    def _run_batch(self, key, z_rows, s_rows, sizes):
        """Pad z_rows to the smallest tier, run one device call, split the
        outputs back into per-request (mask, tokens) chunks of `sizes`.

        The device->host copy happens INSIDE the lock on purpose: while
        this batch computes + transfers, the dispatcher blocks here, so
        pending requests accumulate into the next (larger) tier call —
        the blocking window IS the adaptive micro-batching window. A
        depth-2 dispatch/complete pipeline was tried in round 5 and lost
        ~35% throughput at every load level (PERFORMANCE.md): the racing
        dispatcher shipped many small tier calls (coalesce 13.4 -> 6.1)
        and the tunnel serializes transfer with the next dispatch anyway,
        so there was no overlap to win."""
        n_total = z_rows.shape[0]
        tier = self.tier_for(n_total)
        z_pad = np.zeros((tier,) + z_rows.shape[1:], z_rows.dtype)
        z_pad[:n_total] = z_rows
        if key[2]:  # conditioned: pad structure rows by repeating the last
            s_pad = np.concatenate(
                [s_rows] + [s_rows[-1:]] * (tier - n_total), axis=0)
        with self._lock:
            gen = self._generator_locked(tier, key[0], key[1], key[2])
            out = gen(z_pad, s_pad) if key[2] else gen(z_pad)
            mask, tokens = (np.asarray(out[0]), np.asarray(out[1]))
            self.stats["device_calls"] += 1
            self.stats["requests"] += len(sizes)
            if len(sizes) > 1:
                self.stats["coalesced_requests"] += len(sizes)
        res, off = [], 0
        for sz in sizes:
            res.append((mask[off:off + sz], tokens[off:off + sz]))
            off += sz
        return res

    def _dispatch_loop(self):
        """Continuous micro-batching: drain the longest compatible FIFO
        prefix of pending requests into one tier call. No artificial delay —
        batching emerges while the device is busy with the previous call."""
        while True:
            with self._pending_cv:
                while not self._pending:
                    self._pending_cv.wait()
                batch = [self._pending.popleft()]
                rows = batch[0].z.shape[0]
                while (self._pending
                       and self._pending[0].key == batch[0].key
                       and rows + self._pending[0].z.shape[0]
                       <= self.batch_cap):
                    w = self._pending.popleft()
                    batch.append(w)
                    rows += w.z.shape[0]
            try:
                z = np.concatenate([w.z for w in batch], axis=0)
                s = (np.concatenate([w.s for w in batch], axis=0)
                     if batch[0].key[2] else None)
                outs = self._run_batch(batch[0].key, z, s,
                                       [w.z.shape[0] for w in batch])
                for w, o in zip(batch, outs):
                    w.out = o
            except BaseException as e:  # propagate to every waiter
                for w in batch:
                    w.err = e
            finally:
                for w in batch:
                    w.event.set()

    def render_midi(self, mask: np.ndarray, tokens: np.ndarray) -> bytes:
        from .midi.fast_render import render_midi_bytes
        from .midi.writer import midi_bytes

        fast = render_midi_bytes(tokens, mask, self.mc.resolution)
        if fast is not None:
            return fast
        song = self._G.song_from_tokens(tokens, mask, self.mc.resolution)
        return midi_bytes(song)


def make_handler(svc: GenerationService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/healthz", "/health"):
                self._send(200, {
                    "status": "ok", "model": svc.model_dir,
                    "n_bars": svc.mc.n_bars, "d": svc.mc.d,
                    "batch_cap": svc.batch_cap, "tiers": svc.tiers,
                    "coalesce": svc.coalesce, "stats": dict(svc.stats),
                })
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                n = int(req.get("n", 1))
                mask, tokens = svc.generate(
                    n, seed=int(req.get("seed", 0)),
                    structure=req.get("structure"),
                    structure_temp=float(req.get("structure_temp", 0.0)),
                    content_temp=float(req.get("content_temp", 0.0)))
                if req.get("format", "midi") == "tokens":
                    self._send(200, {"mask": mask.tolist(),
                                     "tokens": tokens.tolist()})
                    return
                mids = [base64.b64encode(
                    svc.render_midi(mask[i], tokens[i])).decode()
                    for i in range(n)]
                self._send(200, {"midi_b64": mids})
            except ValueError as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover - defensive
                self._send(500, {"error": repr(e)})

    return Handler


def serve(model_dir: str, host: str = "127.0.0.1", port: int = 8000,
          batch_cap: int = 256, warmup: bool = True,
          tiers: Optional[Sequence[int]] = None, coalesce: bool = True):
    """Blocking server entry point; returns the (started) server object
    when called with port=0 in tests (caller handles serve_forever)."""
    svc = GenerationService(model_dir, batch_cap=batch_cap, tiers=tiers,
                            coalesce=coalesce)
    if warmup:
        svc.warmup()
    httpd = ThreadingHTTPServer((host, port), make_handler(svc))
    return httpd, svc
