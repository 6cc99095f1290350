"""Minimal production generation server.

The reference has no serving story (SURVEY.md: CLI scripts only); this is
the framework's deployment surface: load a checkpoint once, keep ONE warm
jitted generator (fixed max batch, so every request reuses the same
compiled program — requests are padded to `batch_cap` and sliced), render
MIDI host-side, serve over stdlib HTTP (no extra dependencies).

    python -m polyphemus_tpu.cli.serve MODEL_DIR --port 8000

API:
  GET  /healthz
      -> {"status": "ok", "model": ..., "n_bars": N, "batch_cap": B}
  POST /generate   {"n": 4, "seed": 123,
                    "structure": [[...]] optional conditioning tensor,
                    "structure_temp": 0.0, "content_temp": 0.0,
                    "format": "midi" | "tokens"}
      -> {"midi_b64": [...]} (one standard MIDI file per sequence)
         or {"tokens": [...], "mask": [...]} for downstream pipelines.

Device work is serialized with a lock (one chip, one program); MIDI
rendering happens outside the lock. Temperature pairs other than the ones
already seen compile a new generator once and are cached.
"""
from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class GenerationService:
    """Model + generator cache; independent of the HTTP layer (usable from
    tests or other frontends directly)."""

    def __init__(self, model_dir: str, batch_cap: int = 64,
                 use_pallas: Optional[bool] = None):
        import jax

        from . import generate as G

        self.model_dir = model_dir
        self.batch_cap = batch_cap
        self.model, self.variables, self.cfg = G.load_model(model_dir)
        self.mc = self.cfg.model
        self.pallas = (jax.default_backend() == "tpu"
                       if use_pallas is None else use_pallas)
        self._gens: dict = {}
        self._lock = threading.Lock()
        self._G = G

    def _generator(self, s_temp: float, c_temp: float, conditioned: bool):
        key = (float(s_temp), float(c_temp), bool(conditioned))
        if key not in self._gens:
            self._gens[key] = self._G.make_generator(
                self.model, self.variables, conditioned=conditioned,
                pallas=self.pallas, structure_temp=s_temp,
                content_temp=c_temp,
                sample_seed=int(s_temp * 1e3 + c_temp) & 0x7FFFFFFF)
        return self._gens[key]

    def warmup(self):
        import jax

        z = jax.numpy.zeros((self.batch_cap, self.mc.d))
        with self._lock:
            jax.block_until_ready(self._generator(0.0, 0.0, False)(z))

    def generate(self, n: int, seed: int = 0, structure=None,
                 structure_temp: float = 0.0, content_temp: float = 0.0):
        """Returns (mask, tokens) numpy arrays for n sequences."""
        import jax

        from .generate import generate_z

        if not 1 <= n <= self.batch_cap:
            raise ValueError(f"n must be in [1, {self.batch_cap}]")
        # pad to the fixed compiled batch; slice the outputs
        z = np.asarray(generate_z(seed, n, self.mc.d))
        z_pad = np.zeros((self.batch_cap, self.mc.d), z.dtype)
        z_pad[:n] = z
        cond = structure is not None
        if cond:
            s = self._G.load_structure_array(
                np.asarray(structure, dtype=bool), self.mc.n_bars,
                self.mc.n_tracks, self.mc.n_timesteps)
            s_b = np.broadcast_to(s, (self.batch_cap,) + s.shape)
        gen = self._generator(structure_temp, content_temp, cond)
        with self._lock:
            out = gen(z_pad, s_b) if cond else gen(z_pad)
            mask, tokens = (np.asarray(out[0]), np.asarray(out[1]))
        return mask[:n], tokens[:n]

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
            if self.path == "/healthz":
                self._send(200, {
                    "status": "ok", "model": svc.model_dir,
                    "n_bars": svc.mc.n_bars, "d": svc.mc.d,
                    "batch_cap": svc.batch_cap,
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
          batch_cap: int = 64, warmup: bool = True):
    """Blocking server entry point; returns the (started) server object
    when called with port=0 in tests (caller handles serve_forever)."""
    svc = GenerationService(model_dir, batch_cap=batch_cap)
    if warmup:
        svc.warmup()
    httpd = ThreadingHTTPServer((host, port), make_handler(svc))
    return httpd, svc
