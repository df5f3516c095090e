"""Real multi-process SPMD test: 2 processes x 4 CPU devices.

Validates the multi-host pieces end-to-end: jax.distributed rendezvous,
global-batch assembly from per-process shards (shard_batch), and a full MAE
train step whose loss is identical on both processes.
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    pid = int(sys.argv[1])
    jax.distributed.initialize(coordinator_address="localhost:{port}",
                               num_processes=2, process_id=pid)
    import numpy as np, jax.numpy as jnp
    from headct_foundation_tpu.parallel.mesh import make_mesh, shard_batch

    assert jax.process_count() == 2
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=8)
    local = np.full((4, 2), float(pid), dtype=np.float32)
    arr, n = shard_batch(local, mesh)
    assert arr.shape == (8, 2), arr.shape
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(("data", "fsdp")))
    total = jax.jit(jnp.sum, in_shardings=(sharding,))(arr)
    val = float(jax.device_get(total))
    assert val == 8.0, val

    from headct_foundation_tpu.config import default_config
    from headct_foundation_tpu.engines import mae_engine
    cfg = default_config()
    cfg.MAE.INPUT_SIZE = 24; cfg.MAE.PATCH_SIZE = 12; cfg.MAE.IN_CHANS = 1
    cfg.MAE.ENCODER_DEPTH = 1; cfg.MAE.ENCODER_EMBED_DIM = 48
    cfg.MAE.ENCODER_MLP_DIM = 96; cfg.MAE.ENCODER_NUM_HEADS = 4
    cfg.MAE.DECODER_DEPTH = 1; cfg.MAE.DECODER_EMBED_DIM = 36
    cfg.MAE.DECODER_MLP_DIM = 72; cfg.MAE.DECODER_NUM_HEADS = 4
    cfg.MAE.USE_BIAS = True
    cfg.MODEL.ROI = [24, 24, 24]; cfg.TRAIN.GRAD_CLIP = 1.0
    rng = jax.random.PRNGKey(0)
    state, _, _ = mae_engine.create_train_state(cfg, mesh, rng, 10, 0)
    step = mae_engine.make_train_step(mesh)
    local_batch = np.random.RandomState(pid).randn(4, 1, 24, 24, 24).astype(np.float32)
    data = mae_engine._to_device_batch(local_batch, mesh)
    state, m = step(state, data, rng)
    print(f"LOSS {{float(jax.device_get(m['loss'])):.6f}}")
    """
)


@pytest.mark.slow
def test_two_process_spmd(tmp_path):
    port = 12000 + os.getpid() % 1000
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=REPO, port=port))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}\n{err[-2000:]}"
        outs.append(out)

    losses = [
        line.split()[1] for out in outs for line in out.splitlines()
        if line.startswith("LOSS")
    ]
    assert len(losses) == 2
    assert losses[0] == losses[1], losses  # identical global loss on both hosts
