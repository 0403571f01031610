"""Time-axis sharding for the Pallas kernel-bank path.

`parallel/banks.py` shards the banks on the CHANNEL axis (zero-comm);
this module adds the TIME axis so one wideband stream scales past
channel count (SURVEY.md §2.3 item 2 / §5.7; r3 VERDICT item 6) — a
("time", "ch") mesh runs each bank on a contiguous time slice of the
block.  Three mechanisms, one per recurrence structure:

- **RawBank — stateless split.**  The mix+filter matmul has no
  cross-row recurrence: window rows and rotator-phase tiles split on
  "time", per-channel constants on "ch", and the block-power row is
  the mean of shard means (one [1, C] ``psum`` — the only collective).
  Numerically identical to single-device.

- **AudioBank — input halos (overlap-save in time) + linear EMA
  reshard.**  The fused FM/AM/SSB chain carries short-memory state
  (discriminator prev row, two FIR tail pairs).  Instead of
  exchanging those carries (they are *outputs* of the left shard — a
  sequential dependency), each shard's input slice is extended LEFT
  by ``halo`` window rows; the kernel recomputes the left context
  from raw input (channelization is stateless per row) and the first
  ``halo/audio_decim`` audio rows are discarded.  FM/RAW are exact
  with zero communication.  The long-memory EMAs (squelch power, AM
  DC follower) are LINEAR in their carried state, so they reshard
  EXACTLY (r4 VERDICT item 4): pass A runs each shard from a zero
  seed to measure its transition contribution, one all-gather + a
  closed-form scan produce the true per-shard seeds, and pass B
  injects them at each shard's first real tile
  (``AudioBankConfig.seed_tile``) — squelch decisions, block power
  and AM (AGC off) bit-match the single-device stream at matched
  tile cadence, at 2× bank compute.  With AGC ON, halo rows' arm
  values still see halo-depth gain context inside the FIR boundary
  window (the remaining documented tolerance).  Shard 0's halo is
  the previous block's last windows (kept host-side), so streaming
  across blocks stays exact.

- **RecoveryBank — exact sequential handoff (turn-taking).**  The
  PSK/FSK/ASK loops (Costas, Gardner, AGC) are per-sample recurrences;
  time shards take turns: every shard runs the recovery kernel each
  stage (SPMD), shard s adopts the outputs on its turn, and its final
  loop state is broadcast (masked ``psum``) as the next shard's
  initial state — bit-matching the single-device stream at the cost
  of serializing this stage (the channelize matmuls above stay
  parallel).  Mirrors parallel/sharding.py's ``handoff="exact"``.

Validated by tests/test_bank_time_sharding.py: time-sharded output ==
single-device for FM (exact) and PSK (exact handoff) on a multi-device
CPU mesh; driven multi-chip by ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_TWO_PI = 2.0 * np.pi


def make_time_ch_mesh(n_time: int, n_ch: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None
                         else jax.devices())
    if len(devices) < n_time * n_ch:
        raise ValueError(
            f"need {n_time * n_ch} devices, have {len(devices)}")
    return Mesh(devices[:n_time * n_ch].reshape(n_time, n_ch),
                axis_names=("time", "ch"))


def _div_le(n: int, limit: int, multiple_of: int = 1) -> int:
    d = min(n, limit)
    d -= d % multiple_of
    while d >= multiple_of and n % d:
        d -= multiple_of
    if d < multiple_of:
        raise ValueError(f"no divisor of {n} ≤ {limit} that is a "
                         f"multiple of {multiple_of}")
    return d


def _local_channels(n_channels: int, tile: int, n_shards: int):
    if n_channels % n_shards:
        raise ValueError(f"n_channels {n_channels} not divisible by "
                         f"ch-mesh size {n_shards}")
    local_c = n_channels // n_shards
    t = min(tile, local_c)
    while local_c % t:
        t -= 1
    return local_c, t


def _phase_rows(base: np.ndarray, rate: np.ndarray, row0: np.ndarray,
                per_tile: int, tiles_per_shard: int,
                n_channels: int) -> np.ndarray:
    """Per-tile start phases for every shard, 8-row sublane padded:
    shard s tile t starts at absolute row row0[s] + t*per_tile."""
    n_t = len(row0)
    out = np.zeros((n_t * tiles_per_shard * 8, n_channels), np.float32)
    for s in range(n_t):
        t = np.arange(tiles_per_shard, dtype=np.float64)[:, None]
        rows = row0[s] + t * per_tile
        out[s * tiles_per_shard * 8:(s + 1) * tiles_per_shard * 8:8] \
            = np.mod(base[None, :] + rows * rate[None, :],
                     _TWO_PI).astype(np.float32)
    return out


class TimeShardedRawBank:
    """RawBank over a ("time", "ch") mesh — stateless row split."""

    def __init__(self, bank, mesh: Mesh) -> None:
        self.bank = bank
        self.mesh = mesh
        cfg = bank.cfg
        n_t, n_c = mesh.shape["time"], mesh.shape["ch"]
        self.n_t = n_t
        if cfg.block_out % n_t:
            raise ValueError(
                f"block_out {cfg.block_out} not divisible by time-mesh "
                f"size {n_t}")
        local_m = cfg.block_out // n_t
        local_c, tile = _local_channels(cfg.n_channels,
                                        cfg.channel_tile, n_c)
        self.mt = _div_le(local_m, cfg.m_tile)
        self.local_m = local_m
        local_cfg = replace(cfg, n_channels=local_c, channel_tile=tile,
                            block_out=local_m, m_tile=self.mt)
        local_call = bank._build(local_cfg, jit=False)

        def step(xw_re, xw_im, h_re, h_im, theta, m_ramp, phi0):
            y_re, y_im, power = local_call(
                xw_re, xw_im, h_re, h_im, theta, m_ramp, phi0)
            power = jax.lax.psum(power, "time") / n_t
            return y_re, y_im, power

        ch = P(None, "ch")
        self._call = jax.jit(jax.shard_map(
            step, mesh=mesh,
            in_specs=(P("time", None), P("time", None), ch, ch, ch,
                      P(), P("time", "ch")),
            out_specs=(P("time", "ch"), P("time", "ch"), ch),
            check_vma=False))
        bank.sharding = NamedSharding(mesh, P(None, "ch"))
        bank._upload()
        self._m_ramp = jnp.asarray(
            np.arange(self.mt, dtype=np.float32)[:, None])

    def _phi_tiles(self) -> np.ndarray:
        b = self.bank
        cfg = b.cfg
        tiles = self.local_m // self.mt
        row0 = np.arange(self.n_t, dtype=np.float64) * self.local_m
        return _phase_rows(b._phi, b._theta64, row0, self.mt, tiles,
                           cfg.n_channels)

    def feed(self, x: np.ndarray, fetch: bool = True):
        b = self.bank
        cfg = b.cfg
        xw_re, xw_im = b.frame(x)
        y_re, y_im, power = self._call(
            xw_re, xw_im, b.consts["h_re"], b.consts["h_im"],
            b.consts["theta"], self._m_ramp, self._phi_tiles())
        b._phi = np.mod(b._phi + b._theta64 * cfg.block_out, _TWO_PI)
        b._power_dev = power
        b._power_host = None
        if fetch:
            return np.asarray(y_re), np.asarray(y_im)
        return y_re, y_im

    @property
    def block_power(self) -> np.ndarray:
        return self.bank.block_power


class TimeShardedAudioBank:
    """AudioBank over a ("time", "ch") mesh — input-halo overlap-save.

    ``halo`` window rows of left context per shard (default covers the
    full discriminator + both FIR dependency depths, making FM/RAW
    exact).  Rounded up to a whole number of time tiles.

    ``exact=True`` (default) makes the squelch EMA and the AM DC
    follower exact as well (r4 VERDICT item 4): both are LINEAR in
    their carried state, so pass A runs every shard from a zero seed
    to measure its transition contribution, an all-gather + closed-form
    scan turns those into the exact per-shard seeds, and pass B
    re-runs with the seeds injected at each shard's first REAL tile
    (``AudioBankConfig.seed_tile``).  Squelch decisions, block power
    and AM (with AGC off) equal the single-device stream bit-for-bit
    when the tile cadence matches (sharded m_tile == single-device
    m_tile); with AGC on, halo rows' arm values still see halo-depth
    gain context inside the FIR boundary window (documented residual).
    Costs 2× the bank compute on sharded runs.
    """

    def __init__(self, bank, mesh: Mesh, halo: int | None = None,
                 exact: bool = True) -> None:
        self.bank = bank
        self.mesh = mesh
        self.exact = exact
        cfg = bank.cfg
        n_t, n_c = mesh.shape["time"], mesh.shape["ch"]
        self.n_t = n_t
        if cfg.block_out % (n_t * cfg.audio_decim):
            raise ValueError(
                f"block_out {cfg.block_out} not divisible by "
                f"n_time*audio_decim = {n_t}*{cfg.audio_decim}")
        local_m = cfg.block_out // n_t
        self.local_m = local_m
        self.mt = _div_le(local_m, cfg.m_tile,
                          multiple_of=cfg.audio_decim)
        if halo is None:
            halo = cfg.audio_taps + \
                cfg.audio_fir_taps * cfg.audio_decim
        # whole time tiles: the EMA seeds inject exactly at the first
        # real tile, and trim stays audio_decim-aligned
        halo += (-halo) % self.mt
        self.halo = halo
        ext_m = local_m + halo
        self.seed_tile = halo // self.mt if exact else 0
        local_c, tile = _local_channels(cfg.n_channels,
                                        cfg.channel_tile, n_c)
        from sigdigger_tpu.kernels.audio import (
            AudioBankConfig,
            _band_matrix,
            _dc_matrices,
        )

        local_cfg = AudioBankConfig(
            sample_rate=cfg.sample_rate, n_channels=local_c,
            taps=cfg.taps, decimation=cfg.decimation,
            audio_taps=cfg.audio_taps, audio_decim=cfg.audio_decim,
            audio_fir_taps=cfg.audio_fir_taps, block_out=ext_m,
            m_tile=self.mt, channel_tile=tile,
            quad_gain=cfg.quad_gain, dc_alpha=cfg.dc_alpha,
            sq_alpha=cfg.sq_alpha, enable_ssb=cfg.enable_ssb,
            hang_agc=cfg.hang_agc, seed_tile=self.seed_tile)
        local_call = bank._build(local_cfg, jit=False)
        trim = halo // cfg.audio_decim
        # per-shard EMA decay over the REAL region (the transitions
        # are linear: state_out = decay·state_in + contribution)
        real_tiles = local_m // self.mt
        beta_dc = float(cfg.dc_alpha) ** cfg.audio_decim
        decay_dc = jnp.float32(beta_dc ** (local_m // cfg.audio_decim))
        SQ_I, DC_I, SQA_I = 16, 17, 26

        def step(*args):
            t = jax.lax.axis_index("time")

            def last(v):
                return jax.lax.psum(
                    jnp.where(t == n_t - 1, v, jnp.zeros_like(v)),
                    "time")

            if exact and n_t > 1:
                # pass A: zero seeds → per-shard transition terms
                a_args = list(args)
                a_args[SQ_I] = jnp.zeros_like(args[SQ_I])
                a_args[DC_I] = jnp.zeros_like(args[DC_I])
                out_a = local_call(*a_args)
                b_sq = jax.lax.all_gather(out_a[7], "time")
                b_dc = jax.lax.all_gather(out_a[8], "time")
                # closed-form seed scan: seed_0 = carry;
                # seed_{s+1} = decay·seed_s + B_s
                decay_sq = (1.0 - args[SQA_I]) ** real_tiles
                my_sq, run_sq = args[SQ_I], args[SQ_I]
                my_dc, run_dc = args[DC_I], args[DC_I]
                for s in range(1, n_t):
                    run_sq = decay_sq * run_sq + b_sq[s - 1]
                    run_dc = decay_dc * run_dc + b_dc[s - 1]
                    my_sq = jnp.where(t == s, run_sq, my_sq)
                    my_dc = jnp.where(t == s, run_dc, my_dc)
                args = list(args)
                args[SQ_I] = my_sq
                args[DC_I] = my_dc
            (audio, last_re, last_im, f1, f2, a1, a2, sq, dc,
             power, agcs) = local_call(*args)
            return (audio[trim:], last(sq), last(dc),
                    jax.lax.psum(power, "time") / n_t, last(agcs))

        ch = P(None, "ch")
        tch = P("time", "ch")
        in_specs = (
            P("time", None), P("time", None),    # xw_re, xw_im
            ch, ch, ch,                          # h_re, h_im, theta
            P(), P(),                            # m_ramp, ia_ramp
            tch, tch,                            # phi0, phs0
            ch,                                  # omega_a
            ch, ch,                              # prev_re/im (zeros)
            ch, ch, ch, ch,                      # f/a tails (zeros)
            ch, ch,                              # sq, dc seeds
            ch, ch, ch, ch,                      # w_fm/am/re1/ssb
            ch, ch, ch, ch, ch,                  # agc/vol/sq_w/lvl/sqa
            ch,                                  # taps2
            P(), P(), P(),                       # bt, tdc, dcpow
            ch, ch,                              # agc_rows, agcs seed
        )
        self._call = jax.jit(jax.shard_map(
            step, mesh=mesh, in_specs=in_specs,
            out_specs=(tch, ch, ch, ch, ch), check_vma=False))
        bank.sharding = NamedSharding(mesh, P(None, "ch"))
        bank._upload_params()

        c = cfg.n_channels
        da = cfg.audio_decim
        self._m_ramp = jnp.asarray(
            np.arange(self.mt, dtype=np.float32)[:, None])
        self._ia_ramp = jnp.asarray(
            np.arange(self.mt // da, dtype=np.float32)[:, None])
        self._bt = jnp.asarray(_band_matrix(local_cfg.fir_tile,
                                            cfg.audio_taps, da))
        tdc, dcpow = _dc_matrices(local_cfg)
        self._tdc = jnp.asarray(tdc)
        self._dcpow = jnp.asarray(dcpow)
        self._zrow = np.zeros((1, c), np.float32)
        self._zf = np.zeros((cfg.audio_taps - 1, c), np.float32)
        self._za = np.zeros((cfg.audio_fir_taps - 1, c), np.float32)
        # shard 0's halo = the previous block's last `halo` window rows
        self._halo_re = np.zeros((halo, cfg.taps), np.float32)
        self._halo_im = np.zeros((halo, cfg.taps), np.float32)

    def _stacked_frames(self, xw_re, xw_im):
        """[n_t*(local_m+halo), K] haloed window planes."""
        h, lm = self.halo, self.local_m
        ext_re = np.concatenate([self._halo_re, xw_re])
        ext_im = np.concatenate([self._halo_im, xw_im])
        parts_re = [ext_re[s * lm:s * lm + h + lm]
                    for s in range(self.n_t)]
        parts_im = [ext_im[s * lm:s * lm + h + lm]
                    for s in range(self.n_t)]
        self._halo_re = xw_re[-h:].copy()
        self._halo_im = xw_im[-h:].copy()
        return np.concatenate(parts_re), np.concatenate(parts_im)

    def _phases(self):
        b = self.bank
        cfg = b.cfg
        da = cfg.audio_decim
        tiles = (self.local_m + self.halo) // self.mt
        row0 = (np.arange(self.n_t, dtype=np.float64) * self.local_m
                - self.halo)
        phi0 = _phase_rows(b._phi, b._theta64, row0, self.mt, tiles,
                           cfg.n_channels)
        phs0 = _phase_rows(b._phs_a, b._omega_a64, row0 / da,
                           self.mt // da, tiles, cfg.n_channels)
        return phi0, phs0

    def feed(self, x: np.ndarray, fetch: bool = True):
        b = self.bank
        cfg = b.cfg
        xw_re, xw_im = b.frame(x)
        sre, sim = self._stacked_frames(xw_re, xw_im)
        phi0, phs0 = self._phases()
        audio, sq, dc, power, agcs = self._call(
            sre, sim, b.consts["h_re"], b.consts["h_im"],
            b.consts["theta"], self._m_ramp, self._ia_ramp, phi0,
            phs0, b.consts["omega_a"], self._zrow, self._zrow,
            self._zf, self._zf, self._za, self._za,
            b._sq, b._dc,
            b.consts["w_fm"], b.consts["w_am"], b.consts["w_re1"],
            b.consts["w_ssb"], b.consts["agc_w"], b.consts["vol"],
            b.consts["sq_w"], b.consts["sq_level"], b.consts["sqa"],
            b.consts["taps2"], self._bt, self._tdc, self._dcpow,
            b.consts["agc_rows"], b._agcs)
        b._sq = sq
        b._sq_host = None
        b._dc = dc
        b._agcs = agcs
        b._power_dev = power
        b._power_host = None
        b._phi = np.mod(b._phi + b._theta64 * cfg.block_out, _TWO_PI)
        b._phs_a = np.mod(b._phs_a + b._omega_a64 * cfg.audio_out,
                          _TWO_PI)
        return np.asarray(audio) if fetch else audio

    def squelch_open(self) -> np.ndarray:
        return self.bank.squelch_open()


class TimeShardedRecoveryBank:
    """RecoveryBank over a ("time", "ch") mesh — exact turn-taking."""

    def __init__(self, bank, mesh: Mesh) -> None:
        self.bank = bank
        self.mesh = mesh
        cfg = bank.cfg
        n_t, n_c = mesh.shape["time"], mesh.shape["ch"]
        self.n_t = n_t
        if cfg.block_len % n_t:
            raise ValueError(
                f"block_len {cfg.block_len} not divisible by "
                f"time-mesh size {n_t}")
        local_m = cfg.block_len // n_t
        local_c, tile = _local_channels(cfg.n_channels,
                                        cfg.channel_tile, n_c)
        mt = _div_le(local_m, cfg.m_tile)
        local_cfg = replace(cfg, n_channels=local_c,
                            channel_tile=tile, block_len=local_m,
                            m_tile=mt)
        local_call = bank._build(local_cfg, jit=False)

        def step(y_re, y_im, state, *params):
            t = jax.lax.axis_index("time")
            out = None
            st = state
            for s in range(n_t):
                sr, si, sb, st2 = local_call(y_re, y_im, st, *params)
                take = t == s
                cur = (sr, si, sb)
                out = cur if out is None else tuple(
                    jnp.where(take, a, b) for a, b in zip(cur, out))
                st = jax.lax.psum(
                    jnp.where(take, st2, jnp.zeros_like(st2)), "time")
            return (*out, st)

        ch = P(None, "ch")
        tch = P("time", "ch")
        self._call = jax.jit(jax.shard_map(
            step, mesh=mesh,
            in_specs=(tch, tch, ch) + (ch,) * 21,
            out_specs=(tch, tch, tch, ch), check_vma=False))
        bank.sharding = NamedSharding(mesh, P(None, "ch"))
        bank._upload()

    def feed_planes(self, y_re, y_im, fetch: bool = True):
        b = self.bank
        c = b.consts
        sr, si, strobe, b.state = self._call(
            y_re, y_im, b.state, c["w_psk"], c["w_fsk"], c["w_ask"],
            c["w1"], c["w2"], c["w4"], c["w8"], c["alpha"], c["beta"],
            c["gp"], c["gf"], c["pmin"], c["pmax"],
            c["fsk_cos"], c["fsk_sin"], c["w_quad"], c["w_coh"],
            c["w_run"], c["eq_en"], c["eq_rate"], c["mf"])
        if not fetch:
            return sr, si, strobe
        return (np.asarray(sr) + 1j * np.asarray(si),
                np.asarray(strobe) > 0.5)
