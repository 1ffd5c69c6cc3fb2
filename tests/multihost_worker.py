"""Multi-host decode worker (launched by scripts/launch_multihost.py).

Each process owns a virtual CPU host (xla_force_host_platform devices);
`initialize_distributed()` joins them into one JAX world with gloo
cross-process collectives — the same code path a real multi-host TPU pod
takes over DCN (SURVEY.md §5: the reference has no multi-process story
at all; this is the north-star "tokens/s scaling measured at 1 host,
N>=2 hosts" rig).

Runs a tiny-Llama dense-cache decode with the batch sharded over the
cross-host `dp` axis (weak scaling: per-host batch constant) and params
replicated, then writes per-run throughput + the greedy transcript to
the output JSON (process 0 only) so the harness can check cross-process
parity and compute scaling efficiency.
"""

import json
import os
import sys
import time

if os.environ.get("FA_TPU_FORCE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

from flash_attention_tpu.parallel.mesh import (  # noqa: E402
    initialize_distributed,
    make_mesh,
)

initialize_distributed()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from flash_attention_tpu.models.llama import (  # noqa: E402
    LlamaConfig,
    decode_step,
    init_kv_cache,
    init_params,
    prefill,
)

PER_HOST_BATCH = 4
DECODE_STEPS = 16
PROMPT = 32


def main(out_path: str) -> None:
    nproc = jax.process_count()
    mesh = make_mesh(dp=nproc, tp=-1)
    cfg = LlamaConfig.tiny(dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))

    batch = PER_HOST_BATCH * nproc
    tokens = np.random.default_rng(7).integers(
        0, cfg.vocab_size, (batch, PROMPT)).astype(np.int32)

    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("dp"))
    params = jax.device_put(params, repl)
    tok_dev = jax.device_put(jnp.asarray(tokens), bsh)

    cache = init_kv_cache(cfg, batch, PROMPT + DECODE_STEPS,
                          dtype=jnp.float32)
    cache = jax.device_put(cache, jax.tree.map(lambda _: bsh, cache))

    logits, cache, lengths = jax.jit(
        lambda p, t, c: prefill(p, t, cfg, c))(params, tok_dev, cache)
    lengths = jax.device_put(lengths, bsh)

    # All decode steps fused in one program (the engine's chunked-decode
    # pattern): ONE dispatch, no per-step host round-trips. The stacked
    # transcript comes back replicated — dp-sharded arrays are not
    # host-addressable across processes, and the replicated out_sharding
    # is the all-gather that makes it fetchable on every host.
    def run(params, tok0, cache, lengths):
        def body(carry, _):
            tok, cache, lengths = carry
            logits, cache, lengths = decode_step(
                params, tok, cfg, cache, lengths)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (tok, cache, lengths), tok

        (_, cache, _), toks = jax.lax.scan(
            body, (tok0, cache, lengths), length=DECODE_STEPS)
        return toks

    run_jit = jax.jit(run, out_shardings=repl)
    tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    first = np.asarray(jax.device_get(
        jax.jit(lambda x: x, out_shardings=repl)(tok0)))
    jax.block_until_ready(run_jit(params, tok0, cache, lengths))  # warmup

    t0 = time.perf_counter()
    toks = jax.block_until_ready(run_jit(params, tok0, cache, lengths))
    dt = time.perf_counter() - t0
    transcript = [first] + list(np.asarray(jax.device_get(toks)))

    # Measured cross-process collective cost: a tiny all-reduce across
    # every device (gloo over loopback here; DCN on a real pod). This
    # is the latency input of the analytic scaling model
    # (parallel/scaling.py; REPORT "Multi-host decode scaling model").
    # Whole-dispatch time, so an UPPER bound on the collective itself.
    ps_fn = jax.jit(jax.shard_map(
        lambda x: jax.lax.psum(x, ("dp", "tp")), mesh=mesh,
        in_specs=P(("dp", "tp")), out_specs=P()))
    xps = jax.device_put(
        jnp.ones((jax.device_count(), 8), jnp.float32),
        NamedSharding(mesh, P(("dp", "tp"))))
    jax.block_until_ready(ps_fn(xps))
    n_it = 20
    t0 = time.perf_counter()
    for _ in range(n_it):
        out = ps_fn(xps)
    jax.block_until_ready(out)
    psum_us = (time.perf_counter() - t0) / n_it * 1e6

    if jax.process_index() == 0:
        with open(out_path, "w") as f:
            json.dump({
                "num_processes": nproc,
                "global_devices": jax.device_count(),
                "batch": batch,
                "decode_steps": DECODE_STEPS,
                "tokens_per_s": batch * DECODE_STEPS / dt,
                "psum_us": psum_us,
                "transcript": np.stack(transcript).T.tolist(),
            }, f)
    print(f"proc {jax.process_index()}/{nproc}: "
          f"{batch * DECODE_STEPS / dt:.1f} tok/s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
