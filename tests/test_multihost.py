"""Multi-HOST (multi-process) data parallelism — the DCN-side story of
SURVEY.md §2.7/§5.8, executed for real: two OS processes, each owning 4
virtual CPU devices, join one 8-device global mesh via jax.distributed;
each process contributes only its local half of the global batch
(``jax.make_array_from_process_local_data``, the multi-host input path named
in PARITY.md §2.7); the jit'd loss/grad runs one cross-process collective.

Asserts (a) both processes compute the identical global loss, (b) that loss
equals the SINGLE-process 8-virtual-device value for the same global batch —
the same exactness contract tests/test_sharding.py pins within one process —
and (c) one optimizer step leaves bit-identical params on both processes
(gradient sync, not just loss reduction).

The worker half of this file runs as ``python tests/test_multihost.py <pid>
<port>`` in subprocesses; pytest only orchestrates and parses their stdout.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BATCH, CHUNK, N_DEV = 8, 2048, 8


def _tiny_model():
    import dataclasses

    from amss_tpu.configs.recipes import c1_stft_dpcl
    from amss_tpu.train.engine import make_model

    r = c1_stft_dpcl()
    cfg = dataclasses.replace(
        r.model,
        sep=dataclasses.replace(r.model.sep, hidden=16, layers=1, embed_dim=4),
    )
    return make_model(cfg)


def _global_batch() -> np.ndarray:
    rng = np.random.default_rng(0)
    return rng.standard_normal((BATCH, 2, CHUNK)).astype(np.float32)


def _loss_and_step(model, params, sources_arr, mesh):
    """jit loss+grad+adam over the mesh; returns (loss, updated-leaf norm)."""
    import jax
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    opt = optax.adam(1e-3)

    def step(p, opt_state, s):
        loss, g = jax.value_and_grad(
            lambda q: model.loss_from_batch(q, {"sources": s})[0]
        )(p)
        upd, opt_state = opt.update(g, opt_state, p)
        return loss, optax.apply_updates(p, upd)

    fn = jax.jit(
        step,
        in_shardings=(rep, rep, data),
        out_shardings=(rep, rep),
    )
    p = jax.device_put(params, rep)
    o = jax.device_put(opt.init(params), rep)
    loss, p2 = fn(p, o, sources_arr)
    leaf = jax.tree_util.tree_leaves(p2)[0]
    return float(loss), float(np.linalg.norm(np.asarray(leaf)))


def _worker(pid: int, port: int) -> None:
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.local_device_count() == N_DEV // 2
    assert len(jax.devices()) == N_DEV
    mesh = Mesh(np.array(jax.devices()), ("data",))

    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))  # same seed -> same init

    half = BATCH // 2
    local = _global_batch()[pid * half : (pid + 1) * half]
    sources = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, (BATCH, 2, CHUNK)
    )
    loss, pnorm = _loss_and_step(model, params, sources, mesh)
    print(json.dumps({"pid": pid, "loss": loss, "pnorm": pnorm}), flush=True)


def test_two_process_dp_matches_single_process():
    # single-process reference on this pytest process's own 8 virtual devices
    import jax

    from amss_tpu.parallel.mesh import batch_sharding, make_mesh

    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh(N_DEV)
    src = jax.device_put(_global_batch(), batch_sharding(mesh))
    ref_loss, ref_pnorm = _loss_and_step(model, params, src, mesh)

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_PLATFORMS="cpu",
    )
    env.pop("PYTEST_CURRENT_TEST", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(i), str(port)],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    recs = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("{"):
                r = json.loads(line)
                recs[r["pid"]] = r
    assert set(recs) == {0, 1}, f"missing worker records: {outs}"
    # (a) both processes agree on the global loss
    np.testing.assert_allclose(recs[0]["loss"], recs[1]["loss"], rtol=0, atol=0)
    # (b) == the single-process 8-device value
    np.testing.assert_allclose(recs[0]["loss"], ref_loss, rtol=1e-5)
    # (c) post-update params identical across processes and vs reference
    np.testing.assert_allclose(recs[0]["pnorm"], recs[1]["pnorm"], rtol=0, atol=0)
    np.testing.assert_allclose(recs[0]["pnorm"], ref_pnorm, rtol=1e-5)


if __name__ == "__main__":
    _worker(int(sys.argv[1]), int(sys.argv[2]))
