"""Two-process collectives test (VERDICT r1 weak #10): exercises the REAL
process_allgather path in `parallel/collectives.py` — pad-to-max pickled
gathers, host-scalar all-reduce, and the barrier — via two actual JAX
processes on localhost (`jax.distributed.initialize`), not the
process_count()==1 short-circuit.
"""

import os
import socket
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent("""
    import sys

    import jax

    # the env pins JAX_PLATFORMS to the TPU relay; only a pre-init config
    # update reliably forces CPU (CLAUDE.md gotchas)
    jax.config.update("jax_platforms", "cpu")

    pid, port = int(sys.argv[1]), sys.argv[2]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2

    from video_rep_learning_tpu.parallel.collectives import (
        all_gather_object, all_reduce_sum, synchronize)

    # ragged pickled objects: process 1's payload is much larger, forcing the
    # pad-to-max branch (`utils/distributed.py:151-265` parity)
    objs = all_gather_object({"rank": pid, "payload": "x" * (10 + 1000 * pid)})
    assert [o["rank"] for o in objs] == [0, 1], objs
    assert len(objs[0]["payload"]) == 10 and len(objs[1]["payload"]) == 1010

    total = all_reduce_sum(float(pid + 1))
    assert total == 3.0, total

    # FineGym-style file-list gather (`evaluate_finegym.py:156-157`)
    files = all_gather_object([f"proc{pid}_video{i}.pkl" for i in range(pid + 1)])
    flat = [f for sub in files for f in sub]
    assert flat == ["proc0_video0.pkl", "proc1_video0.pkl", "proc1_video1.pkl"]

    synchronize()
    print(f"child {pid} OK")
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_collectives(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {i} failed:\n{out}"
        assert f"child {i} OK" in out
