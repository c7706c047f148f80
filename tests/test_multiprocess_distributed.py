"""Two-process jax.distributed bring-up on CPU (SURVEY.md section 4:
"multi-host without a cluster"). Each process owns 2 virtual CPU devices;
the pair forms one 4-device global mesh over localhost DCN (grpc), runs a
psum and the engine's heartbeat barrier, and checks global device counts."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_CHILD = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from quantized_tpu.parallel.distributed import initialize_multihost, heartbeat_barrier, local_batch_slice

    ok = initialize_multihost({coord!r}, 2, int(sys.argv[1]))
    assert ok, "initialize returned False"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    mesh = Mesh(jax.devices(), ("data",))
    # every process contributes its rank; global psum must see both
    val = multihost_utils.process_allgather(jnp.float32(jax.process_index() + 1))
    assert float(val.sum()) == 3.0, val
    heartbeat_barrier(timeout_s=60)
    sl = local_batch_slice(8)
    assert sl == slice(jax.process_index() * 4, jax.process_index() * 4 + 4), sl
    print("CHILD_OK", jax.process_index())
    """
)


@pytest.mark.slow
def test_two_process_psum_and_barrier(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "child.py"
    script.write_text(_CHILD.format(repo=repo, coord=coord))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-2000:]}"
        assert f"CHILD_OK {i}" in out


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
