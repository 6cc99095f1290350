"""Generation engine.

Reference counterpart: /root/reference/generate.py:21-114. The defining
difference (SURVEY.md §3.2): the reference thresholds structure logits,
round-trips through the CPU to rebuild PyG graphs, then decodes content; here
`z -> structure logits -> threshold -> lattice -> content logits -> token ids`
is ONE jitted, batched device function. Only MIDI rendering stays host-side.
"""
from __future__ import annotations

import functools
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import constants, utils
from .config import GenerationConfig, TrainConfig, load_train_config
from .midi.song import Note, Song, Track
from .models import VAE
from .ops.kernels import gcl_pallas


# ----------------------------------------------------------------------- loading
def load_model(model_dir: str):
    """Load a trained model from either our native checkpoint directory or a
    reference torch model directory (auto-detected).

    Returns (model, variables, train_config).
    """
    if os.path.exists(os.path.join(model_dir, "checkpoint.msgpack")):
        from flax import serialization

        cfg_path = os.path.join(model_dir, "config.json")
        if os.path.exists(cfg_path):
            cfg = load_train_config(cfg_path)
        else:
            cfg = TrainConfig()
        model = VAE(cfg.model)
        with open(os.path.join(model_dir, "checkpoint.msgpack"), "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        variables = {"params": raw["params"],
                     "batch_stats": raw.get("batch_stats", {})}
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        return model, variables, cfg
    if os.path.exists(os.path.join(model_dir, "checkpoint")):
        from .convert import convert_torch_model_dir

        variables, cfg = convert_torch_model_dir(model_dir)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        return VAE(cfg.model), variables, cfg
    raise FileNotFoundError(
        f"no checkpoint.msgpack or torch `checkpoint` in {model_dir}")


def generate_z(seed: int, n: int, d: int) -> jax.Array:
    """z ~ N(0, I) (reference generate.py:90-98)."""
    return jax.random.normal(jax.random.key(seed), (n, d))


# ----------------------------------------------------------------- device pipeline
def _tokens_from_logits(c_logits):
    """Argmax (pitch, dur) ids per slot: (..., 15, 230) -> (..., 15, 2)."""
    pitch = jnp.argmax(c_logits[..., : constants.N_PITCH_TOKENS], axis=-1)
    dur = jnp.argmax(c_logits[..., constants.N_PITCH_TOKENS:], axis=-1)
    return jnp.stack([pitch, dur], axis=-1).astype(jnp.int32)


def as_bf16(variables):
    """Cast every floating leaf of a variable tree to bfloat16 (the bf16
    generation policy; int leaves like batch counters stay untouched)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, variables)


def with_pallas(model: VAE) -> VAE:
    """The same model with the fused Pallas GCL kernels enabled (identical
    param tree; no-op if already enabled)."""
    if model.cfg.use_pallas_gcl:
        return model
    import dataclasses

    return VAE(dataclasses.replace(model.cfg, use_pallas_gcl=True))


def make_generator(model: VAE, variables, *, conditioned: bool = False,
                   return_logits: bool = False, bf16: bool = False,
                   pallas: bool = False, structure_temp: float = 0.0,
                   content_temp: float = 0.0, sample_seed: int = 0):
    """Build the jitted z->music function.

    Returns fn(z[, mask]) -> (mask, tokens) (+ (s_logits, c_logits) when
    return_logits): mask (B, nb, T, S) bool, tokens (B, nb, T, S, 15, 2)
    uint8 argmax ids at every cell (callers apply the mask; ids fit —
    pitch < 131, duration < 99 — and the device->host copy rides the
    tunnel, so the narrow dtype cuts transfer 4x vs int32: 31.5 -> 7.9 MB
    per batch-256 call, the dominant per-call cost in serving).

    bf16=True runs the decode in bfloat16 (~2x MXU throughput). Measured
    deviation vs fp32 (bench_all numerics stage, n=256 flagship shape,
    random-init weights — a near-worst case, sigmoids hover near the 0.5
    threshold): 0.09% of structure cells flip and 4.0% of decoded notes
    differ as a multiset (bench_report bf16_structure_flip_rate /
    bf16_note_multiset_diff_rate). Keep fp32 when parity with the
    reference matters. pallas=True uses the fused VMEM GCL kernel
    (fastest; same MXU-rounding class of deviation).
    """
    if pallas:
        model = with_pallas(model)
        # Round-5 default: chain 2 GCL layers per kernel invocation on the
        # eval path — measured 12 898 -> 14 225 seq/s fp32 (51.3 -> 56.6%
        # MFU) at the bench.py protocol (PERFORMANCE.md round 5; chain 4
        # and other tiles lose). Applied here (not in ModelConfig) because
        # this function also sizes the jit's scoped-VMEM option to the
        # chained kernel's need — arbitrary jits around VAE.decode would
        # not. POLY_GCL_CHAIN=1 opts out; explicit cfg.gcl_chain wins.
        if model.cfg.gcl_chain == 1 and not os.environ.get("POLY_GCL_CHAIN"):
            import dataclasses

            model = VAE(dataclasses.replace(model.cfg, gcl_chain=2))
    if bf16:
        variables = as_bf16(variables)

    stochastic = structure_temp > 0 or content_temp > 0

    def run(z, mask, key):
        if bf16:
            z = z.astype(jnp.bfloat16)
        if return_logits:
            s_logits, c_logits, used_mask = model.apply(
                variables, z, mask, method=VAE.decode)
            return used_mask, \
                _tokens_from_logits(c_logits).astype(jnp.uint8), \
                s_logits, c_logits
        # fused unembed + argmax/sampling path: logits never materialize
        rngs = {"gen": key} if stochastic else None
        s_logits, tokens, used_mask = model.apply(
            variables, z, mask, method=VAE.decode_tokens,
            structure_temp=structure_temp, content_temp=content_temp,
            rngs=rngs)
        return used_mask, tokens.astype(jnp.uint8)

    # Fresh sampling noise per call: the key folds in a host-side call
    # counter, so repeated stochastic gen(z) calls draw independent noise
    # (a closure-baked key would reuse identical noise every call). The
    # deterministic (temperature 0) path ignores the key.
    base_key = jax.random.key(sample_seed)
    # the chained GCL eval kernel holds K packed weight stacks resident in
    # VMEM — size the jit's scoped-VMEM option to its declared need
    min_vmem = None
    cfg = model.cfg
    chain = int(os.environ.get("POLY_GCL_CHAIN", 0)) or cfg.gcl_chain
    if cfg.use_pallas_gcl and chain > 1:
        bb = (int(os.environ.get("POLY_GCL_EVAL_BB", 0))
              or cfg.gcl_bars_per_block)
        min_vmem = gcl_pallas.chain_vmem_bytes(
            min(chain, cfg.gnn_n_layers), cfg.d, bb, 2 if bf16 else 4,
            cfg.n_tracks * cfg.n_timesteps)
    copts = utils.compiler_options(min_vmem)
    jitted = jax.jit(run, compiler_options=copts)
    calls = iter(range(1 << 62))

    def next_key():
        return (jax.random.fold_in(base_key, next(calls)) if stochastic
                else base_key)

    if conditioned:
        return lambda z, mask: jitted(z, mask, next_key())
    jitted_nomask = jax.jit(lambda z, key: run(z, None, key),
                            compiler_options=copts)
    return lambda z: jitted_nomask(z, next_key())


def mtp_from_logits(c_logits, mask):
    """Dense multitrack-pianoroll logits with hard silences at inactive
    cells (reference utils.py:59-79): pitch EOS one-hot at slot 0, PAD
    elsewhere. API-compatibility helper; the fast path uses token ids.

    c_logits: (B, nb, T, S, 15, 230); mask: (B, nb, T, S) bool.
    """
    silence = jnp.zeros(c_logits.shape[-2:], c_logits.dtype)
    silence = silence.at[0, constants.PitchToken.EOS].set(1.0)
    silence = silence.at[1:, constants.PitchToken.PAD].set(1.0)
    m = mask[..., None, None]
    return jnp.where(m, c_logits, silence)


# -------------------------------------------------------------------- host render
def song_from_tokens(tokens: np.ndarray, mask: np.ndarray, resolution: int,
                     gen_config: Optional[GenerationConfig] = None) -> Song:
    """One sample's (tokens, mask) -> Song.

    Follows reference muspy_from_mtp (utils.py:83-141): per track, walk
    global timesteps and note slots; stop a cell at EOS/PAD of pitch or
    duration; skip SOS pitches (the reference checks pitch twice —
    utils.py:114-115 — so a SOS duration with a valid pitch also emits;
    reproduced); durations remap [0,95] -> [1,96], clamped to sequence end.
    """
    gen_config = gen_config or GenerationConfig()
    n_bars, n_tracks, n_ts = mask.shape
    total = n_bars * n_ts
    tracks = []
    for t in range(n_tracks):
        name = constants.TRACKS[t]
        is_drum = t == constants.DRUMS_TRACK
        notes = []
        for b in range(n_bars):
            for s in range(n_ts):
                if not mask[b, t, s]:
                    continue
                gt = b * n_ts + s
                for slot in range(tokens.shape[-2]):
                    pitch, dur = tokens[b, t, s, slot]
                    if (pitch in (constants.PitchToken.EOS,
                                  constants.PitchToken.PAD)
                            or dur in (constants.DurationToken.EOS,
                                       constants.DurationToken.PAD)):
                        break
                    if pitch == constants.PitchToken.SOS:
                        continue
                    duration = min(int(dur) + 1, total - gt)
                    notes.append(Note(gt, int(pitch), duration, 64))
        program = gen_config.midi_programs.get(name, 0)
        tracks.append(Track(name=name, is_drum=is_drum,
                            program=0 if is_drum else program, notes=notes))
    return Song(resolution=resolution, tempo=120.0, tracks=tracks)


def load_structure_array(s: np.ndarray, n_bars: int, n_tracks: int,
                         n_timesteps: int) -> np.ndarray:
    """Validate a structure-conditioning tensor
    (reference generate.py:196-232): tile partial bars, fix empty bars."""
    s = np.asarray(s, dtype=bool)
    expected = [n_bars, n_tracks, n_timesteps]
    dims = list(s.shape)
    if dims != expected:
        if (len(dims) != 3 or dims[1:] != expected[1:]
                or dims[0] > n_bars):
            raise ValueError(
                f"structure tensor dims {dims} do not match {expected}")
        reps = -(-n_bars // dims[0])
        s = np.tile(s, (reps, 1, 1))[:n_bars]
    empty = ~s.any(axis=(-1, -2))
    if empty.any():
        s = s.copy()
        s[empty, 0, 0] = True
    return s


def load_structure_file(path: str, n_bars: int, n_tracks: int,
                        n_timesteps: int) -> np.ndarray:
    """Load + validate a structure-conditioning JSON file."""
    with open(path) as f:
        return load_structure_array(np.asarray(json.load(f), dtype=bool),
                                    n_bars, n_tracks, n_timesteps)


def synthesize_audio(midi_path: str, soundfont_path: Optional[str]) -> bool:
    """<file>.mid -> <file>.wav: external fluidsynth when available (the
    reference's muspy.write_audio chain), else the built-in numpy synth.
    Returns whether a wav was produced."""
    import shutil
    import subprocess

    wav_path = os.path.splitext(midi_path)[0] + ".wav"
    fs = shutil.which("fluidsynth")
    if fs is not None and soundfont_path is not None \
            and os.path.exists(soundfont_path):
        subprocess.run([fs, "-ni", soundfont_path, midi_path, "-F", wav_path,
                        "-r", "44100"], check=False, capture_output=True)
        if os.path.exists(wav_path):
            return True
    # fallback: built-in software synth (no external deps)
    from .midi.parser import quantize_song, read_midi
    from .midi.synth import song_to_wav

    song, tpq, _ = read_midi(midi_path)
    song = quantize_song(song, tpq, max(tpq, 1))
    song.resolution = max(tpq, 1)
    song_to_wav(song, wav_path)
    return os.path.exists(wav_path)


def save_song(song: Song, out_dir: str, name: str, *, audio: bool = False,
              soundfont_path: Optional[str] = None) -> None:
    """Write <name>.mid (+ .wav when requested and fluidsynth available)."""
    from .midi.writer import write_midi

    os.makedirs(out_dir, exist_ok=True)
    midi_path = os.path.join(out_dir, name + ".mid")
    write_midi(midi_path, song)
    if audio:
        synthesize_audio(midi_path, soundfont_path)
