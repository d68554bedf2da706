"""2-process jax.distributed test (VERDICT r1 item 7).

Every other test runs process_count==1, leaving the DCN-side logic —
``make_array_from_process_local_data`` global-batch assembly in
``shard_batch`` and the trainer's per-process dataset offsets — untested.
Here two local CPU processes form a real jax.distributed cluster (2 local
devices each, 4 global) and prove that a global batch assembled from two
process-local halves equals the full-batch computation.

Reference topology being matched: main_procgen.py:301-316 (per-process batch
split) and :642-701 (host resharding generator).
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

WORKER = textwrap.dedent(
    """
    import sys
    import jax

    jax.config.update("jax_platforms", "cpu")
    coordinator, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=coordinator, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    import jax.numpy as jnp
    import numpy as np

    from arp_tpu.parallel import MeshConfig, create_mesh, shard_batch

    mesh = create_mesh(MeshConfig(dp=4))

    # the global batch 0..15; each process holds its contiguous half, as the
    # trainer's per-process dataset offset produces
    full = np.arange(16, dtype=np.float32).reshape(16, 1)
    local = full[pid * 8 : (pid + 1) * 8]
    with mesh:
        gbatch = shard_batch({"x": local}, mesh)["x"]
        assert gbatch.shape == (16, 1), gbatch.shape

        @jax.jit
        def stats(x):
            return jnp.sum(x), jnp.sum(x * jnp.arange(x.shape[0], dtype=x.dtype)[:, None])

        total, weighted = stats(gbatch)
    want_total = full.sum()
    want_weighted = (full[:, 0] * np.arange(16)).sum()
    assert float(total) == want_total, (float(total), want_total)
    assert float(weighted) == want_weighted, (float(weighted), want_weighted)
    print(f"proc{pid} OK", flush=True)
    """
)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_global_batch_assembly(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    coordinator = f"localhost:{_free_port()}"

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coordinator, str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
    assert "proc0 OK" in outs[0] and "proc1 OK" in outs[1]


PPG_WORKER = textwrap.dedent(
    """
    import sys
    import jax

    jax.config.update("jax_platforms", "cpu")
    coordinator, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=coordinator, num_processes=2, process_id=pid)

    import numpy as np

    from arp_tpu.collect.ppg import PPGConfig, learn
    from arp_tpu.envs.fake import FakeProcgen
    from arp_tpu.parallel import MeshConfig, create_mesh

    mesh = create_mesh(MeshConfig(dp=4))

    def env_fn():
        return FakeProcgen("coinrun", {"episode_length": 12, "image_size": 16, "grid": 3})

    config = PPGConfig(num_envs=2, segment_length=8, minibatches=2, n_pi=2,
                       aux_epochs=1, aux_minibatches=2, lr=1e-3)
    with mesh:
        state, hist = learn(env_fn, config, total_iterations=2, seed=0, mesh=mesh)
    assert len(hist) == 2, hist
    for rec in hist:
        for k, v in rec.items():
            assert np.isfinite(v), (k, v)
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
    checksum = float(sum(np.abs(np.asarray(l, np.float64)).sum() for l in leaves))
    print(f"proc{pid} CHECKSUM={checksum:.10f}", flush=True)
    """
)


def test_two_process_ppg_mirrors_mpi_ranks(tmp_path):
    """PPG over a 2-process global mesh: each rank rolls ITS OWN envs
    (process-offset seeds, reference MPI train.py semantics) and the sharded
    updates see both ranks' segments — proven by both ranks ending with
    bitwise-identical params."""
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    coordinator = f"localhost:{_free_port()}"

    script = tmp_path / "ppg_worker.py"
    script.write_text(PPG_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coordinator, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=420)
        outs.append(out)
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-4000:]}"
    sums = [
        line.split("CHECKSUM=")[1]
        for out in outs
        for line in out.splitlines()
        if "CHECKSUM=" in line
    ]
    assert len(sums) == 2, outs
    assert sums[0] == sums[1], f"rank params diverged: {sums}"
