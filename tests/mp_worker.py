"""Multi-process data-parallel worker (spawned by test_multiprocess.py and
__graft_entry__.dryrun_multichip's multi-process leg).

Each process owns ONE cpu device; two processes form a 2-device 'data' mesh
via jax.distributed.initialize + gloo CPU collectives.  The worker runs ONE
supervised dp train step on its shard of a deterministic synthetic global
batch through the production code path (create_mesh -> global_batch ->
make_train_step) and prints the loss; the parent asserts both processes
print the SAME loss and that it matches a single-process run of the same
global batch (same 2-way partition, so bit-identical reduction order).

Usage: python tests/mp_worker.py <process_id> <num_processes> <port>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PID = int(sys.argv[1])
NPROC = int(sys.argv[2])
PORT = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # exactly one local device per process

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
# persistent compile cache: the train-step compile dominates worker wall
# time; repeat runs (tests + driver dryrun) hit the cache and finish in
# seconds
jax.config.update("jax_compilation_cache_dir", os.path.abspath(
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                           num_processes=NPROC, process_id=PID)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from polardepth_tpu.config import Config  # noqa: E402
from polardepth_tpu.data.synthetic import SyntheticHammer  # noqa: E402
from polardepth_tpu.parallel.mesh import (  # noqa: E402
    create_mesh, batch_sharding, replicated_sharding, global_batch,
)
from polardepth_tpu.train.trainer import (  # noqa: E402
    build_model, make_train_step, TRAIN_BATCH_KEYS,
)
from polardepth_tpu.train.state import create_train_state  # noqa: E402


def main():
    assert jax.process_count() == NPROC, jax.process_count()
    assert jax.device_count() == NPROC and jax.local_device_count() == 1
    h = w = 32
    gbs = 2 * NPROC
    cfg = Config(height=h, width=w, batch_size=gbs, dropout_rate=0.0)
    mesh = create_mesh((-1,))
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    example = {"color": jnp.zeros((1, h, w, 3), jnp.float32),
               "pol": jnp.zeros((1, h, w, 4), jnp.float32)}
    # init is deterministic, so every process builds identical params; the
    # replicated device_put then needs no cross-host transfer
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, 1e-4)
    state = jax.tree_util.tree_map(
        lambda x: global_batch(np.asarray(x), replicated_sharding(mesh)),
        state)

    full = SyntheticHammer(h, w, seed=7).batch(gbs)
    per = gbs // NPROC
    sh = batch_sharding(mesh)
    gb = {k: global_batch(np.asarray(full[k][PID * per:(PID + 1) * per]), sh)
          for k in TRAIN_BATCH_KEYS}

    step = jax.jit(make_train_step(model, cfg))
    # AOT-compile BEFORE the first collective executes, then rendezvous at
    # the coordination-service barrier: on a 1-core host the two workers'
    # first compiles can skew by minutes (persistent-cache misses compile
    # serially on the shared core), and gloo's rendezvous inside the first
    # executed collective times out at a fixed 30 s.  The barrier has its
    # own generous timeout, so compile skew never spans the gloo window.
    compiled = step.lower(state, gb, jax.random.PRNGKey(1)).compile()
    from jax._src.distributed import global_state  # jax 0.9 location
    global_state.client.wait_at_barrier("mp_worker_compiled",
                                        timeout_in_ms=40 * 60 * 1000)
    new_state, logs = compiled(state, gb, jax.random.PRNGKey(1))
    print(f"MP_LOSS {PID} {float(logs['loss']):.10f}", flush=True)
    # one more step to exercise the grad all-reduce on updated params too
    _, logs2 = compiled(new_state, gb, jax.random.PRNGKey(2))
    print(f"MP_LOSS2 {PID} {float(logs2['loss']):.10f}", flush=True)


if __name__ == "__main__":
    main()
