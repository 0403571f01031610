"""Multi-chip execution of the Pallas kernel-bank path.

This is the scale-out story for the code that actually runs on the
target hardware: the bank kernels behind ``KernelAnalyzer``
(kernels/rawbank.py, kernels/audio.py, kernels/recovery.py) and the
Bailey PSD (kernels/fft.py).  Reference analog: N independent
inspectors on one wideband stream (reference
Suscan/Analyzer.cpp:460-484); SURVEY.md §2.3 item 2 maps that to
channel parallelism over a device mesh.

Design — zero per-step communication on the channel axis:

- every per-channel quantity (mix-baked tap columns, one-hot demod
  rows, loop-state planes, phase columns) is sharded on its channel
  axis with ``PartitionSpec(None, "ch")``; the time-plane input
  (the framed IQ windows, identical for every channel) is replicated;
- each shard runs the SAME Pallas kernel, built for its local channel
  count — channels are fully independent in these kernels, so the
  sharded bank is numerically identical to the single-chip bank
  (asserted by tests/test_bank_sharding.py across mesh layouts);
- the PSD kernel shards its *frames* over the same devices and
  ``psum``s the per-device partial power fold — one [A, B] all-reduce
  per block, the only collective on this path.

``shard_*`` mutates the bank in place: its ``_call`` becomes a
jitted ``shard_map`` over the mesh and its constant uploads are placed
with the channel sharding, so ``configure_channel`` (open/retune/
close) keeps working without recompiling — the dynamic-analyzer
contract is preserved across chips.
"""

from __future__ import annotations

from dataclasses import replace

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_ch_mesh(n_ch: int, devices=None) -> Mesh:
    """A 1-D ("ch",) mesh over ``n_ch`` devices."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < n_ch:
        raise ValueError(f"need {n_ch} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_ch]), axis_names=("ch",))


def _local_channels(n_channels: int, tile: int, n_shards: int) -> tuple:
    if n_channels % n_shards:
        raise ValueError(
            f"n_channels {n_channels} not divisible by mesh size "
            f"{n_shards}")
    local_c = n_channels // n_shards
    t = min(tile, local_c)
    while local_c % t:
        t -= 1
    return local_c, t


def _shard(bank, mesh: Mesh, axis: str, in_specs, out_specs,
           local_cfg) -> None:
    local_call = bank._build(local_cfg, jit=False)
    # check_vma=False: pallas_call out_shapes carry no vma annotation
    fn = jax.shard_map(local_call, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    bank._call = jax.jit(fn)
    bank.sharding = NamedSharding(mesh, P(None, axis))


def shard_raw_bank(bank, mesh: Mesh, axis: str = "ch"):
    """Shard a kernels.rawbank.RawBank over ``mesh[axis]`` in place."""
    cfg = bank.cfg
    local_c, tile = _local_channels(cfg.n_channels, cfg.channel_tile,
                                    mesh.shape[axis])
    ch = P(None, axis)
    rep = P()
    #            xw_re xw_im h_re h_im theta m_ramp phi0
    in_specs = (rep, rep, ch, ch, ch, rep, ch)
    out_specs = (ch, ch, ch)        # y_re, y_im, power
    _shard(bank, mesh, axis, in_specs, out_specs,
           replace(cfg, n_channels=local_c, channel_tile=tile))
    bank._upload()
    return bank


def shard_audio_bank(bank, mesh: Mesh, axis: str = "ch"):
    """Shard a kernels.audio.AudioBank over ``mesh[axis]`` in place."""
    cfg = bank.cfg
    local_c, tile = _local_channels(cfg.n_channels, cfg.channel_tile,
                                    mesh.shape[axis])
    ch = P(None, axis)
    rep = P()
    in_specs = (
        rep, rep,                   # xw_re, xw_im
        ch, ch, ch,                 # h_re, h_im, theta
        rep, rep,                   # m_ramp, ia_ramp
        ch, ch, ch,                 # phi0, phs0, omega_a
        ch, ch,                     # prev_re, prev_im
        ch, ch, ch, ch,             # ftail1/2, atail1/2
        ch, ch,                     # sq, dc
        ch, ch, ch, ch,             # w_fm, w_am, w_re1, w_ssb
        ch, ch, ch, ch,             # agc_w, vol, sq_w, sq_level
        ch,                         # sqa
        ch,                         # taps2
        rep, rep, rep,              # bt, tdc, dcpow
        ch, ch,                     # agc_rows, agcs
    )
    # audio, last_re/im, ftail1/2, atail1/2, sq, dc, pow, agcs
    out_specs = (ch,) * 11
    _shard(bank, mesh, axis, in_specs, out_specs,
           replace(cfg, n_channels=local_c, channel_tile=tile))
    bank._upload_params()
    return bank


def shard_recovery_bank(bank, mesh: Mesh, axis: str = "ch"):
    """Shard a kernels.recovery.RecoveryBank over ``mesh[axis]`` in
    place.  Its inputs are the RawBank's sharded output planes, so the
    chained banks never gather between kernels."""
    cfg = bank.cfg
    local_c, tile = _local_channels(cfg.n_channels, cfg.channel_tile,
                                    mesh.shape[axis])
    ch = P(None, axis)
    # y_re, y_im, state, 20 per-channel parameter rows, mf — all [*, C]
    in_specs = (ch,) * 24
    out_specs = (ch,) * 4           # sym_re, sym_im, strobe, state
    _shard(bank, mesh, axis, in_specs, out_specs,
           replace(cfg, n_channels=local_c, channel_tile=tile))
    bank._upload()
    return bank


def shard_psd(psd, mesh: Mesh, axis: str = "ch"):
    """Shard a kernels.fft.PallasPSD's *frames* over ``mesh[axis]``:
    each device folds power over its frame subset with the GLOBAL
    normalization, then one [A, B] psum yields the block-mean PSD on
    every device (the sweep/psum fold of SURVEY.md §2.3 item 3)."""
    cfg = psd.cfg
    n = mesh.shape[axis]
    fb = cfg.frames_per_program
    if cfg.frames_per_block % (n * fb):
        raise ValueError(
            f"frames_per_block {cfg.frames_per_block} not divisible by "
            f"mesh size x frames_per_program = {n}x{fb}")
    local_cfg = replace(cfg, frames_per_block=cfg.frames_per_block // n)
    local_call = psd._build(local_cfg, psd._scale, jit=False)

    def step(x_re, x_im, *consts):
        return jax.lax.psum(local_call(x_re, x_im, *consts), axis)

    cols = P(None, axis)            # packed [2A, F·B]: frames on cols
    in_specs = (cols, cols) + (P(),) * 7
    psd._call = jax.jit(jax.shard_map(step, mesh=mesh,
                                      in_specs=in_specs, out_specs=P(),
                                      check_vma=False))
    return psd
