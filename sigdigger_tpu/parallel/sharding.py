"""Mesh sharding for the receiver pipeline.

The reference's concurrency axes (SURVEY.md §2.3) map onto a 2-D device
mesh:

- ``ch``  — channel parallelism (the reference's N independent
  inspectors on one wideband stream): per-channel constants and demod
  state are sharded on the channel axis; the input block is replicated
  within a ``ch`` row.  This is the TP/SP analog — no cross-device
  communication inside a step.
- ``time`` — time-block parallelism (the sequential-stream analog of
  context parallelism): each device processes a contiguous time slice
  of the block; the overlap-save history (N/2 samples) is exchanged
  with the left neighbor via ``jax.lax.ppermute`` — the halo exchange
  of SURVEY.md §5.7 — and the PSD fold is combined with a weighted
  ``psum``.

Collectives ride ICI: one ppermute of hop-size complex64 per step plus
one psum of the [fft_size] PSD row.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sigdigger_tpu.pipeline import (
    PipelineConfig,
    _DEMODS,
    _extract,
    _stft,
)


def make_mesh(n_time: int = 1, n_ch: int | None = None,
              devices=None) -> Mesh:
    """2-D mesh over ("time", "ch")."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_ch is None:
        n_ch = len(devices) // n_time
    assert n_time * n_ch <= len(devices)
    grid = devices[: n_time * n_ch].reshape(n_time, n_ch)
    return Mesh(grid, axis_names=("time", "ch"))


def sharded_pipeline_step(cfg: PipelineConfig, consts: dict[str, Any],
                          state: dict[str, Any], x: jax.Array,
                          handoff: str = "replica"):
    """Pipeline step body for `shard_map` over a ("time", "ch") mesh.

    Per-device view: ``x`` is this device's time slice (already split on
    the time axis), channel constants/state are this device's channel
    slice.  The overlap tail for time shard t comes from shard t-1's
    trailing hop samples (ppermute); shard 0 uses the carried state
    tail.  The PSD EMA fold is exact across shards: each shard's fold is
    combined with the closed-form decay weights via psum.
    """
    t_idx = jax.lax.axis_index("time")
    n_time = jax.lax.axis_size("time")
    hop = cfg.hop

    def bcast_last(v):
        """Replicate the LAST time shard's value to every time shard
        (deterministic state carry for the next block)."""
        if v.dtype == jnp.bool_:
            picked = jnp.where(t_idx == n_time - 1, v.astype(jnp.int32),
                               jnp.zeros(v.shape, jnp.int32))
            return jax.lax.psum(picked, "time").astype(jnp.bool_)
        picked = jnp.where(t_idx == n_time - 1, v, jnp.zeros_like(v))
        return jax.lax.psum(picked, "time")

    # --- halo exchange of overlap-save history -------------------------
    my_tail = x[-hop:]
    left_tail = jax.lax.ppermute(
        my_tail, "time",
        perm=[(i, (i + 1) % n_time) for i in range(n_time)],
    )
    # shard 0 uses the state-carried tail (previous block's end)
    tail = jnp.where(t_idx == 0, state["tail"], left_tail)

    # shard 0 seeds the EMA with the carried PSD (or its first frame on
    # the very first block); shards t>0 must fold with a ZERO seed, which
    # _stft selects when its count argument is > 0.
    spectra, new_tail, psd_part, psd_count = _stft(
        tail, x, consts["taps"], consts["psd_scale"],
        jnp.where(t_idx == 0, state["psd"], jnp.zeros_like(state["psd"])),
        jnp.where(t_idx == 0, state["psd_count"], jnp.int32(1)),
        jnp.float32(cfg.psd_alpha), cfg.fft_size,
    )
    # last time shard's tail becomes next block's carry
    carried_tail = bcast_last(new_tail)

    # --- exact cross-shard EMA combination -----------------------------
    # shard t folded f frames over its slice: psd_part_t = D*seed_t +
    # fold_t with D = (1-a)^f and seed only on shard 0.  The sequential
    # EMA over the whole block is sum_t D^(n_time-1-t) * psd_part_t.
    frames_per_shard = (x.shape[0] // hop) // 2
    decay = jnp.float32((1.0 - cfg.psd_alpha) ** frames_per_shard)
    weight = decay ** (n_time - 1 - t_idx).astype(jnp.float32)
    psd = jax.lax.psum(weight * psd_part, "time")

    state = dict(state)
    state["tail"] = carried_tail
    state["psd"] = psd
    state["psd_count"] = state["psd_count"] + jnp.int32(
        n_time * frames_per_shard)

    # --- channel extraction + demod (channel-sharded, local) -----------
    # frame parity and residual phase continue across time shards
    my_frames = x.shape[0] // hop
    parity = state["frame_parity"] + t_idx * my_frames
    phi = jnp.mod(
        state["phi"] + consts["dphi"] *
        (t_idx * my_frames * (cfg.n_sub // 2)).astype(jnp.float32),
        2.0 * np.pi,
    )
    y, phi_new, _ = _extract(spectra, consts, phi, parity, cfg.n_sub,
                             cfg.fft_size)
    state["phi"] = bcast_last(jnp.mod(phi_new, 2.0 * np.pi))
    state["frame_parity"] = state["frame_parity"] + \
        jnp.int32(n_time * my_frames)

    if cfg.demod == "fm":
        # FM is EXACT under time sharding: the discriminator needs a
        # 1-sample halo and the audio FIR a (K-1)-sample halo, both
        # exchanged over ICI like the overlap-save tail.
        right = [(i, (i + 1) % n_time) for i in range(n_time)]
        left_y = jax.lax.ppermute(y[:, -1], "time", perm=right)
        prev = jnp.where(t_idx == 0, state["quad_prev"], left_y)
        shifted = jnp.concatenate([prev[:, None], y[:, :-1]], axis=1)
        f = jnp.angle(y * jnp.conj(shifted)) * jnp.float32(1.0 / np.pi)
        k1 = cfg.audio_taps - 1
        left_f = jax.lax.ppermute(f[:, -k1:], "time", perm=right)
        ftail = jnp.where(t_idx == 0, state["lpf_tail"].real, left_f)
        from sigdigger_tpu.dsp.filters import _conv_real
        audio = _conv_real(jnp.concatenate([ftail, f], axis=1),
                           consts["audio_taps"])
        state["quad_prev"] = bcast_last(y[:, -1])
        state["lpf_tail"] = bcast_last(
            jnp.asarray(f[:, -k1:], jnp.complex64))
        outputs = {"audio": audio}
    elif cfg.demod == "am":
        # AM is EXACT under time sharding: the DC-removal EMA is a
        # linear time-varying recurrence, so the cross-shard reshard is
        # closed-form — each shard scans with a ZERO initial carry,
        # publishes its fold via all_gather ([n_time, C] of tiny rows
        # over ICI), computes its true initial carry as a decayed
        # prefix sum, and corrects its outputs analytically:
        #   carry_n = a^(n+1)·c0 + z_n  ⇒  out_n = out_zero_n − a^(n+1)·c0
        alpha = jnp.float32(0.9995)
        mag = jnp.abs(y)
        t_len = mag.shape[1]

        def dc_step(carry, m):
            carry = alpha * carry + (1 - alpha) * m
            return carry, m - carry

        zfold, a_zero = jax.lax.scan(dc_step,
                                     jnp.zeros_like(state["dc"]),
                                     jnp.transpose(mag))
        all_b = jax.lax.all_gather(zfold, "time")      # [n_time, C]
        decay_t = alpha ** t_len
        s_idx = jnp.arange(n_time, dtype=jnp.float32)
        tf = t_idx.astype(jnp.float32)
        w = jnp.where(s_idx < tf, decay_t ** (tf - 1.0 - s_idx), 0.0)
        c0 = decay_t ** tf * state["dc"] + w @ all_b
        ramp = alpha ** jnp.arange(1, t_len + 1, dtype=jnp.float32)
        a = jnp.transpose(a_zero) - ramp[None, :] * c0[:, None]
        state["dc"] = bcast_last(decay_t * c0 + zfold)
        # audio FIR halo, as in the FM branch
        right = [(i, (i + 1) % n_time) for i in range(n_time)]
        k1 = cfg.audio_taps - 1
        left_a = jax.lax.ppermute(a[:, -k1:], "time", perm=right)
        atail = jnp.where(t_idx == 0, state["lpf_tail"].real, left_a)
        from sigdigger_tpu.dsp.filters import _conv_real
        audio = _conv_real(jnp.concatenate([atail, a], axis=1),
                           consts["audio_taps"])
        state["lpf_tail"] = bcast_last(
            jnp.asarray(a[:, -k1:], jnp.complex64))
        outputs = {"audio": audio}
    elif cfg.demod == "psk" and handoff == "exact" and n_time > 1:
        # EXACT sequential handoff for the recurrent loop chain
        # (AGC→Costas→MF→Gardner): time shards take turns — every
        # shard runs the demod each stage (SPMD), shard s adopts its
        # outputs on its turn, and its final loop state is broadcast
        # (masked psum over ICI) as the next shard's initial state.
        # Cost: the demod stage serializes (×n_time); the FFT/
        # channelize stages above stay fully parallel.  This is the
        # validation-grade mode; `replica` restores full parallelism
        # with per-shard re-acquisition (SURVEY.md §5.7 deviation).
        def bcast_from(sel, v):
            if v.dtype == jnp.bool_:
                p = jnp.where(sel, v.astype(jnp.int32),
                              jnp.zeros(v.shape, jnp.int32))
                return jax.lax.psum(p, "time").astype(jnp.bool_)
            return jax.lax.psum(jnp.where(sel, v, jnp.zeros_like(v)),
                                "time")

        rec_keys = [k for k in ("agc", "costas", "mf_tail", "clock")
                    if k in state]
        rec = {k: state[k] for k in rec_keys}
        outputs = None
        for s in range(n_time):
            st = dict(state)
            st.update(rec)
            st2, out = _DEMODS["psk"](cfg, consts, st, y)
            take = t_idx == s
            outputs = out if outputs is None else jax.tree.map(
                lambda new, old: jnp.where(take, new, old),
                out, outputs)
            sel = take
            rec = {k: jax.tree.map(lambda v: bcast_from(sel, v), st2[k])
                   for k in rec_keys}
        state.update(rec)
    else:
        state, outputs = _DEMODS[cfg.demod](cfg, consts, state, y)
        # recurrent demod states: carry the last time shard's values (for
        # t>0 shards the within-block state is a per-shard replica —
        # documented deviation, loops re-acquire within a shard; exact
        # with n_time=1 or handoff="exact")
        for key in ("quad_prev", "lpf_tail", "dc", "agc", "costas",
                    "mf_tail", "clock"):
            if key in state:
                v = state[key]
                state[key] = (tuple(bcast_last(t) for t in v)
                              if isinstance(v, tuple) else bcast_last(v))
    outputs["psd"] = psd
    return state, outputs


def shard_pipeline(cfg: PipelineConfig, mesh: Mesh,
                   handoff: str = "replica"):
    """Build a jitted sharded step:  (consts, state, x) → (state, out).

    ``handoff`` selects the cross-time-shard treatment of recurrent
    demod state: "replica" (parallel, per-shard re-acquisition) or
    "exact" (sequential masked handoff — bit-matches n_time=1 at the
    cost of serializing the demod stage).  FM and AM are exact under
    either setting (halo exchange / closed-form linear reshard).

    Layouts: x split on "time"; per-channel constants and all [C, ...]
    state split on "ch"; scalars and the overlap tail replicated.
    NOTE — the demod loop states are per-channel, so the time axis must
    not split them: demod scans run within a time shard and their state
    carry across time shards is resolved by the scan itself running on
    the full per-shard slice.  For strict recurrent equivalence across
    the time axis use n_time=1 (channel-only sharding); with n_time>1
    loop states are per-(time, channel) replicas — documented deviation
    (SURVEY.md §5.7), acquisition re-converges per shard.
    """
    def spec_for(path_leaf):
        return P()

    consts_specs = {
        "idx": P("ch", None), "resp": P("ch", None), "k0": P("ch"),
        "dphi": P("ch"), "taps": P(), "psd_scale": P(),
    }
    extra = {k: P() for k in ("audio_taps", "mf_taps")}

    def build_specs(consts, state):
        cs = {k: consts_specs.get(k, extra.get(k, P())) for k in consts}
        ss = {}
        for k, v in state.items():
            if k in ("tail", "frame_parity", "psd", "psd_count"):
                ss[k] = P()
            elif isinstance(v, tuple):
                ss[k] = tuple(P("ch") if t.ndim >= 1 else P() for t in v)
            elif getattr(v, "ndim", 0) >= 1:
                ss[k] = P("ch") if v.shape[0] == cfg.n_channels else P()
            else:
                ss[k] = P()
        return cs, ss

    def make(consts, state):
        cs, ss = build_specs(consts, state)
        fn = jax.shard_map(
            partial(sharded_pipeline_step, cfg, handoff=handoff),
            mesh=mesh,
            in_specs=(cs, ss, P("time")),
            out_specs=(ss, {"psd": P(),
                            **{k: P("ch", "time") for k in
                               _demod_output_keys(cfg)}}),
            check_vma=False,
        )
        return jax.jit(fn)

    return make


def _demod_output_keys(cfg: PipelineConfig):
    return {"fm": ["audio"], "am": ["audio"],
            "psk": ["symbols", "strobes"], "raw": ["iq"]}[cfg.demod]
