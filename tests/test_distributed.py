"""Multi-host (DCN) runtime: 2 processes x 4 CPU devices.

VERDICT r1 item 4: `jax.distributed` initialization, a DCN-aware
hybrid mesh, cross-process collectives, and the block-scatter /
result-gather path — validated with real separate processes (the JAX
multi-process runtime over gRPC), not just a virtual mesh.

The worker script runs the SAME sharded receiver program in both
processes (SPMD), feeds one global block via
`make_array_from_process_local_data`, and process 0 checks its local
channel shards against a single-device reference.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    import jax
    jax.config.update("jax_platforms", "cpu")
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import numpy as np
    from jax.sharding import PartitionSpec as P
    from sigdigger_tpu.parallel import distributed
    from sigdigger_tpu.parallel.sharding import shard_pipeline
    from sigdigger_tpu.pipeline import (
        PipelineConfig, init_state, jit_pipeline, make_constants)

    distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)
    assert jax.device_count() == 8, jax.device_count()

    cfg = PipelineConfig(sample_rate=1_024_000.0, fft_size=1024,
                         n_channels=8, n_sub=64, demod="fm")
    stations = np.linspace(-400e3, 400e3, 8)
    consts = make_constants(cfg, stations, np.full(8, 30e3))

    # deterministic FM test signal (same on both hosts)
    n = 1 << 15
    t = np.arange(n) / cfg.sample_rate
    x = np.zeros(n, np.complex128)
    for f0 in stations:
        msg = np.sin(2 * np.pi * 800.0 * t)
        x += 0.5 * np.exp(1j * (2 * np.pi * f0 * t
                                + 2 * np.pi * 5000.0
                                * np.cumsum(msg) / cfg.sample_rate))
    x = x.astype(np.complex64)

    mesh = distributed.make_hybrid_mesh(n_time=4)   # time on ICI
    assert mesh.shape == {"time": 4, "ch": 2}
    # the ch axis must span processes (DCN), time must not
    col_procs = {mesh.devices[i, 0].process_index for i in range(4)}
    assert len(col_procs) == 1, "time axis straddles processes"
    row_procs = {mesh.devices[0, j].process_index for j in range(2)}
    assert len(row_procs) == 2, "ch axis should span processes"

    step = shard_pipeline(cfg, mesh)(consts, init_state(cfg))
    xg = distributed.host_array(mesh, P("time"), x)   # DCN scatter
    state, out = step(consts, init_state(cfg), xg)

    # implicit result gather: this host's channel shards
    mine = distributed.local_outputs(out["audio"])
    assert mine, "no addressable audio shards on this host"

    if pid == 0:
        ref_state, ref_out = jit_pipeline(cfg)(consts, init_state(cfg), x)
        a_ref = np.asarray(ref_out["audio"])
        for index, data in mine:
            assert np.allclose(data, a_ref[index], atol=2e-3), \\
                np.abs(data - a_ref[index]).max()
        # psd is replicated (P()) — addressable everywhere
        psd = np.asarray(out["psd"].addressable_shards[0].data)
        assert np.allclose(psd, np.asarray(ref_out["psd"]),
                           rtol=1e-3, atol=1e-8)
    print(f"OK {pid}", flush=True)
""")


@pytest.mark.skipif(os.environ.get("SD_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_dcn_pipeline(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo" + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd="/root/repo") for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"OK {i}" in out
