"""Cross-process-count checkpoint/resume: written by 2 processes, restored
by 4 and by 1 (VERDICT r3 ask #7).

The 2-process SPMD test (test_multihost.py) pins save/load on one topology;
this one changes the process count between write and restore — the failure
class where a shard-layout or addressability assumption baked into the
gather/restore path only holds for the writing topology. Both checkpoint
backends (pickle gather + orbax cooperative shard writes) are exercised,
and the restore goes through the SAME ``restore_state`` the CLI mains use
to resume (content-based routing target), including onto a live state whose
fsdp shards span processes.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_COMMON = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", {local_devices})
    pid = int(sys.argv[1])
    jax.distributed.initialize(coordinator_address="localhost:{port}",
                               num_processes={nprocs}, process_id=pid)
    import numpy as np, jax.numpy as jnp
    from headct_foundation_tpu.config import default_config
    from headct_foundation_tpu.engines import mae_engine
    from headct_foundation_tpu.parallel.mesh import make_mesh

    assert jax.process_count() == {nprocs}
    assert len(jax.devices()) == 8
    cfg = default_config()
    cfg.MAE.INPUT_SIZE = 24; cfg.MAE.PATCH_SIZE = 12; cfg.MAE.IN_CHANS = 1
    cfg.MAE.ENCODER_DEPTH = 1; cfg.MAE.ENCODER_EMBED_DIM = 48
    cfg.MAE.ENCODER_MLP_DIM = 96; cfg.MAE.ENCODER_NUM_HEADS = 4
    cfg.MAE.DECODER_DEPTH = 1; cfg.MAE.DECODER_EMBED_DIM = 36
    cfg.MAE.DECODER_MLP_DIM = 72; cfg.MAE.DECODER_NUM_HEADS = 4
    cfg.MAE.USE_BIAS = True
    cfg.MODEL.ROI = [24, 24, 24]; cfg.TRAIN.GRAD_CLIP = 1.0
    rng = jax.random.PRNGKey(0)
    mesh = make_mesh(data=4, fsdp=2)  # fsdp shards span processes
    state, _, _ = mae_engine.create_train_state(cfg, mesh, rng, 10, 0)
    qkv0 = state.params["blocks_0"]["attn"]["qkv"]["kernel"]
    assert not qkv0.is_fully_addressable
    """
)

_WRITER = _COMMON + textwrap.dedent(
    """
    # Deterministic mutation so a restore is distinguishable from fresh init
    # (same seed reproduces init on any topology): params <- params + 1.
    bump = jax.jit(lambda p: jax.tree.map(lambda x: x + 1.0, p))
    state = state.replace(params=bump(state.params), step=7)
    from headct_foundation_tpu.utils.checkpoint import (
        save_checkpoint, save_checkpoint_orbax)
    from jax.experimental import multihost_utils
    save_checkpoint(state, 3, 0.5, {ckdir!r}, "w2.ckpt")
    save_checkpoint_orbax(state, 3, 0.5, {ckdir!r}, "w2_orbax")
    multihost_utils.sync_global_devices("written")
    print("WROTE OK")
    """
)

_READER = _COMMON + textwrap.dedent(
    """
    from headct_foundation_tpu.utils.checkpoint import (
        load_checkpoint, restore_state, save_checkpoint)
    from jax.experimental import multihost_utils

    # local oracle: replicated init on a pure-DP mesh is addressable
    mesh_dp = make_mesh(data=8)
    s_dp, _, _ = mae_engine.create_train_state(cfg, mesh_dp, rng, 10, 0)
    ref = np.asarray(
        jax.device_get(s_dp.params["blocks_0"]["attn"]["qkv"]["kernel"])
    ) + 1.0

    for name in ("w2.ckpt", "w2_orbax"):
        payload = load_checkpoint(os.path.join({ckdir!r}, name))
        st, epoch, best = restore_state(state, payload)
        assert epoch == 3 and best == 0.5, (name, epoch, best)
        got = st.params["blocks_0"]["attn"]["qkv"]["kernel"]
        assert not got.is_fully_addressable  # restored WITH the live sharding
        # each process checks its own shards against the oracle slice the
        # shard's index addresses (axis- and order-agnostic)
        assert len(got.addressable_shards) >= 1
        for s in got.addressable_shards:
            assert np.array_equal(np.asarray(s.data), ref[s.index]), (
                name, s.index)
        # the restored state steps (optimizer state restored consistently)
        step = mae_engine.make_train_step(mesh)
        batch = mae_engine._to_device_batch(
            np.random.RandomState(pid).randn(2, 1, 24, 24, 24).astype(np.float32),
            mesh,
        )
        st2, m = step(st, batch, rng)
        loss = float(jax.device_get(m["loss"]))
        assert np.isfinite(loss)
        print(f"RESTORED {{name}} {{loss:.6f}}")

    # re-save from the 4-process topology for the 1-process driver restore
    payload = load_checkpoint(os.path.join({ckdir!r}, "w2.ckpt"))
    st, _, _ = restore_state(state, payload)
    save_checkpoint(st, 9, 0.25, {ckdir!r}, "w4.ckpt")
    multihost_utils.sync_global_devices("resaved")
    print("RESAVED OK")
    """
)


def _run(tmp_path, script: str, nprocs: int, local_devices: int, port: int,
         tag: str):
    worker = tmp_path / f"worker_{tag}.py"
    worker.write_text(
        script.format(repo=REPO, port=port, nprocs=nprocs,
                      local_devices=local_devices, ckdir=str(tmp_path))
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(nprocs)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"{tag} worker failed:\n{out[-2000:]}\n{err[-3000:]}"
        outs.append(out)
    return outs


@pytest.mark.slow
def test_cross_process_count_resume(tmp_path):
    base_port = 13000 + os.getpid() % 1000
    # phase A: 2 processes x 4 devices write both backends
    outs = _run(tmp_path, _WRITER, nprocs=2, local_devices=4,
                port=base_port, tag="w")
    assert sum("WROTE OK" in o for o in outs) == 2

    # phase B: 4 processes x 2 devices restore both + step + re-save
    outs = _run(tmp_path, _READER, nprocs=4, local_devices=2,
                port=base_port + 1, tag="r")
    for name in ("w2.ckpt", "w2_orbax"):
        losses = [
            line.split()[2] for o in outs for line in o.splitlines()
            if line.startswith(f"RESTORED {name} ")
        ]
        assert len(losses) == 4, (name, outs)
        assert len(set(losses)) == 1, (name, losses)  # identical global loss
    assert sum("RESAVED OK" in o for o in outs) == 4

    # phase C: the single-process driver restores the 4-process-written
    # checkpoint (pod-trained -> one-host workflow)
    from headct_foundation_tpu.utils.checkpoint import load_checkpoint

    payload = load_checkpoint(str(tmp_path / "w4.ckpt"))
    assert payload["epoch"] == 9 and payload["step"] == 7
    qkv = np.asarray(payload["params"]["blocks_0"]["attn"]["qkv"]["kernel"])
    w2 = load_checkpoint(str(tmp_path / "w2.ckpt"))
    assert np.array_equal(
        qkv, np.asarray(w2["params"]["blocks_0"]["attn"]["qkv"]["kernel"])
    )
