"""Two-process END-TO-END tests (VERDICT r2 missing #3): beyond raw
collectives, run (a) a real pjit train step over a GLOBAL mesh spanning two
processes (4 virtual CPU devices each) and assert loss equality across
processes and against the single-process 8-device run, and (b) the FineGym
eval flow's fragile cross-process part — per-process embedding pickles on a
shared directory, `all_gather_object` of the file lists, and the jitted
linear probe over the merged list (`evaluate_finegym.py:133-268` parity).
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRAIN_CHILD = textwrap.dedent("""
    import os, sys

    import jax

    jax.config.update("jax_platforms", "cpu")
    pid, port = int(sys.argv[1]), sys.argv[2]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    import numpy as np

    sys.path.insert(0, os.environ["VRL_TESTS"])
    from test_distributed import make_batch, tiny_cfg

    from video_rep_learning_tpu.parallel.mesh import create_mesh, shard_batch
    from video_rep_learning_tpu.train.trainer import Trainer

    B = 8
    cfg = tiny_cfg(B)
    cfg.TRAINING_ALGO = "scl"
    cfg.OPTIMIZER.TYPE = "MomentumOptimizer"
    mesh = create_mesh()  # global: 2 processes x 4 devices
    assert mesh.devices.size == 8

    tr = Trainer(cfg, no_eval=True, build_loaders=False, mesh=mesh)
    tr.init_state()
    step = tr.build_train_step()
    batch = make_batch(B)  # every process holds the same global batch
    dev_batch = shard_batch(mesh, batch)
    key = jax.random.key(42)
    state, loss = step(tr.state, dev_batch, key, 0, False, 1e-3)
    state, loss2 = step(state, dev_batch, key, 1, False, 1e-3)
    l0, l1 = float(loss["loss"]), float(loss2["loss"])
    print(f"child {pid} LOSSES {l0:.8f} {l1:.8f}")
""")

FINEGYM_CHILD = textwrap.dedent("""
    import os, pickle, sys

    import jax

    jax.config.update("jax_platforms", "cpu")
    pid, port, shared = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)

    import numpy as np

    from video_rep_learning_tpu.config import get_cfg
    from video_rep_learning_tpu.evaluation.finegym import train_linear_probe
    from video_rep_learning_tpu.parallel.collectives import (all_gather_object,
                                                             synchronize)

    cfg = get_cfg()
    cfg.MODEL.EMBEDDER_MODEL.EMBEDDING_SIZE = 8
    cfg.EVAL.CLASS_NUM = 3
    cfg.EVAL.CLASSIFICATION_LR = 0.1
    cfg.EVAL.CLASSIFICATION_EPOCHS = 3

    # each process dumps ITS videos (disjoint, like a sharded loader) to the
    # SHARED directory, exactly like dump_embeddings_dataset does
    rng = np.random.RandomState(100 + pid)
    my_files = []
    for i in range(6):
        name = f"video_p{pid}_{i}"
        label = (i + pid) % 3
        embs = (rng.randn(12, 8) + 3.0 * label).astype(np.float32)
        path = os.path.join(shared, name + ".pkl")
        with open(path, "wb") as f:
            pickle.dump({"embs": embs,
                         "labels": np.full((12,), label, np.int64),
                         "name": name}, f)
        my_files.append(path)

    files = sorted(f for sub in all_gather_object(my_files) for f in sub)
    assert len(files) == 12, files  # both processes see the merged list
    train, val = files[:8], files[8:]
    acc = train_linear_probe(cfg, train, val, 1.0, 0, None)
    synchronize()
    print(f"child {pid} PROBE {acc:.6f}")
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_pair(script_text, tmp_path, extra_args=()):
    script = tmp_path / "child.py"
    script.write_text(script_text)
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["VRL_TESTS"] = os.path.join(REPO, "tests")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), *extra_args],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        # a hung distributed rendezvous must not leak two python processes
        # on the 1-core host (they'd starve the rest of the suite)
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {i} failed:\n{out}"
    return outs


def test_two_process_train_step(tmp_path):
    """pjit train step on a global 2x4 mesh: both processes compute the same
    loss, equal to the single-process 8-device run of the same step."""
    outs = _run_pair(TRAIN_CHILD, tmp_path)
    losses = []
    for i, out in enumerate(outs):
        line = [l for l in out.splitlines() if f"child {i} LOSSES" in l]
        assert line, out
        losses.append(tuple(float(v) for v in line[0].split()[-2:]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    # single-process 8-device reference (this pytest process has 8 devices)
    import jax

    from test_distributed import make_batch, tiny_cfg
    from video_rep_learning_tpu.parallel.mesh import create_mesh, shard_batch
    from video_rep_learning_tpu.train.trainer import Trainer

    B = 8
    cfg = tiny_cfg(B)
    cfg.TRAINING_ALGO = "scl"
    cfg.OPTIMIZER.TYPE = "MomentumOptimizer"
    mesh = create_mesh()
    tr = Trainer(cfg, no_eval=True, build_loaders=False, mesh=mesh)
    tr.init_state()
    step = tr.build_train_step()
    dev_batch = shard_batch(mesh, make_batch(B))
    key = jax.random.key(42)
    state, loss = step(tr.state, dev_batch, key, 0, False, 1e-3)
    state, loss2 = step(state, dev_batch, key, 1, False, 1e-3)
    np.testing.assert_allclose(
        [float(loss["loss"]), float(loss2["loss"])], losses[0], rtol=2e-5)


def test_two_process_finegym_eval_gather(tmp_path):
    """FineGym eval path: per-process pickles on a shared dir + gathered file
    lists + the jitted probe — both processes converge to one accuracy."""
    shared = tmp_path / "finegym_eval"
    shared.mkdir()
    outs = _run_pair(FINEGYM_CHILD, tmp_path, extra_args=(str(shared),))
    accs = []
    for i, out in enumerate(outs):
        line = [l for l in out.splitlines() if f"child {i} PROBE" in l]
        assert line, out
        accs.append(float(line[0].split()[-1]))
    assert accs[0] == accs[1]
    assert accs[0] > 0.9  # separable synthetic classes must be learned
