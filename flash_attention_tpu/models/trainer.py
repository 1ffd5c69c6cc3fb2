"""Training loop with checkpoint/resume over the sharded train step.

The harness layer the reference never built (its training-relevant code
stops at the autograd binding, FA2-triton.py:173-244): a synchronous
training loop that jits the family's train step, checkpoints
(params, opt_state, step) via utils/checkpoint.py, and resumes from the
latest step after interruption — the failure-recovery story for long
runs (SURVEY.md §5 "failure detection / elastic recovery: none").

Three model families share one loop (`family=`):

  * ``dense``    — `make_train_step` over a dp/fsdp/tp mesh (or one chip).
  * ``pipeline`` — `make_pp_train_step` (GPipe) / `make_pp_train_step_1f1b`
                   over a pp x dp (x tp) mesh; state is (stages, shared).
                   tokens: [n_microbatches, batch, T].
  * ``moe``      — `make_moe_train_step` over a dp x ep mesh; router
                   aux metrics from the last step land in
                   ``trainer.last_metrics``.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from flash_attention_tpu.models.llama import (
    LlamaConfig,
    init_params,
    make_train_step,
    param_shardings,
)
from flash_attention_tpu.utils.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)


@dataclasses.dataclass
class TrainerConfig:
    ckpt_dir: str | None = None
    ckpt_every: int = 100
    max_to_keep: int = 3
    remat: bool = False
    log_every: int = 10


class Trainer:
    """Owns (params, opt_state, step); runs the jitted train step and
    checkpoints/resumes. `mesh`/`tp_size` enable sharded training.

    For ``family="pipeline"`` `self.params` is the `(stages, shared)`
    pair produced by `split_pipeline_params`; for the other families it
    is the plain param pytree.
    """

    def __init__(self, cfg, optimizer, *,
                 trainer_cfg: TrainerConfig | None = None, mesh=None,
                 tp_size: int | None = None, seed: int = 0,
                 family: str = "dense", pp_schedule: str = "gpipe"):
        self.cfg = cfg
        self.optimizer = optimizer
        self.tc = trainer_cfg or TrainerConfig()
        self.mesh = mesh
        self.family = family
        self.step_num = 0
        self.last_metrics: dict | None = None

        init = getattr(self, f"_init_{family}", None)
        if init is None:
            raise ValueError(
                f"unknown family {family!r} "
                "(expected dense | pipeline | moe)")
        init(tp_size=tp_size, seed=seed, pp_schedule=pp_schedule)

        if self.tc.ckpt_dir is not None:
            last = latest_step(self.tc.ckpt_dir)
            if last is not None:
                self.restore(last)

    # --- per-family setup ------------------------------------------------

    def _put_opt_state(self, opt_state, param_shardings):
        """Commit the eagerly-init'd optimizer state to the mesh:
        param-shaped leaves (moments) follow their parameter's sharding,
        scalar leaves (step counts) replicate. Uncommitted leaves would
        otherwise clash with committed params inside jit — and restore()
        relies on every live leaf carrying an authoritative sharding."""
        import optax

        repl = NamedSharding(self.mesh, P())
        opt_sh = optax.tree_map_params(
            self.optimizer, lambda _, s: s, opt_state, param_shardings,
            transform_non_params=lambda _: repl)
        return jax.tree.map(jax.device_put, opt_state, opt_sh)

    def _init_dense(self, *, tp_size, seed, pp_schedule):
        cfg, optimizer = self.cfg, self.optimizer
        params = init_params(cfg, jax.random.PRNGKey(seed))
        if self.mesh is not None:
            specs = param_shardings(cfg, tp_size=tp_size)
            shardings = jax.tree.map(
                lambda s: NamedSharding(self.mesh, s), specs,
                is_leaf=lambda x: isinstance(x, P))
            params = jax.tree.map(jax.device_put, params, shardings)
        self.params = params
        self.opt_state = optimizer.init(params)
        if self.mesh is not None:
            self.opt_state = self._put_opt_state(self.opt_state, shardings)
        # Donate params/opt_state: without donation every step keeps the
        # old buffers alive alongside the new ones (~2x peak HBM).
        self._step_fn = jax.jit(
            make_train_step(cfg, optimizer, remat=self.tc.remat),
            donate_argnums=(0, 1))

    def _init_pipeline(self, *, tp_size, seed, pp_schedule):
        from flash_attention_tpu.parallel.pipeline import (
            make_pp_train_step,
            make_pp_train_step_1f1b,
            pipeline_shardings,
            split_pipeline_params,
        )

        if self.mesh is None or "pp" not in self.mesh.shape:
            raise ValueError("family='pipeline' needs a mesh with a "
                             "'pp' axis (and 'dp'; optionally 'tp')")
        cfg, optimizer = self.cfg, self.optimizer
        pp = self.mesh.shape["pp"]
        tp_axis = "tp" if self.mesh.shape.get("tp", 1) > 1 else None
        stages, shared = split_pipeline_params(
            init_params(cfg, jax.random.PRNGKey(seed)), pp)
        opt_state = optimizer.init((stages, shared))
        st_s, sh_s, o_s = pipeline_shardings(
            self.mesh, stages, shared, opt_state,
            optimizer=optimizer, tp_axis=tp_axis)
        stages = jax.tree.map(jax.device_put, stages, st_s)
        shared = jax.tree.map(jax.device_put, shared, sh_s)
        self.params = (stages, shared)
        self.opt_state = jax.tree.map(jax.device_put, opt_state, o_s)
        if pp_schedule == "1f1b":
            self._step_fn = make_pp_train_step_1f1b(
                self.mesh, cfg, optimizer)
        elif pp_schedule == "gpipe":
            self._step_fn = make_pp_train_step(
                self.mesh, cfg, optimizer, remat=self.tc.remat)
        else:
            raise ValueError(f"unknown pp_schedule {pp_schedule!r}")

    def _init_moe(self, *, tp_size, seed, pp_schedule):
        from flash_attention_tpu.models.moe import (
            init_moe_params,
            make_moe_train_step,
            moe_param_shardings,
        )

        if self.mesh is None or "ep" not in self.mesh.shape:
            raise ValueError("family='moe' needs a mesh with 'dp' and "
                             "'ep' axes")
        cfg, optimizer = self.cfg, self.optimizer
        params = init_moe_params(cfg, jax.random.PRNGKey(seed))
        shardings = jax.tree.map(
            lambda s: NamedSharding(self.mesh, s),
            moe_param_shardings(cfg),
            is_leaf=lambda x: isinstance(x, P))
        params = jax.tree.map(jax.device_put, params, shardings)
        self.params = params
        self.opt_state = self._put_opt_state(
            optimizer.init(params), shardings)
        self._step_fn = make_moe_train_step(
            self.mesh, cfg, optimizer, remat=self.tc.remat)

    # --- checkpointing --------------------------------------------------

    def _state(self):
        return {"params": self.params, "opt_state": self.opt_state}

    def save(self) -> None:
        if self.tc.ckpt_dir is None:
            return
        save_checkpoint(self.tc.ckpt_dir, self.step_num, self._state(),
                        max_to_keep=self.tc.max_to_keep)

    def restore(self, step: int | None = None) -> int:
        step, state = restore_checkpoint(
            self.tc.ckpt_dir, step=step, template=self._state())
        # Re-apply the live state's shardings: a restored leaf lands on
        # the default device, and a mixed-placement (params sharded,
        # opt_state on one device) train step is a hard error.
        state = jax.tree.map(
            lambda new, old: (jax.device_put(new, old.sharding)
                              if hasattr(old, "sharding") else new),
            state, self._state())
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.step_num = step
        return step

    # --- loop -------------------------------------------------------------

    def train_step(self, tokens) -> float:
        if self.family == "pipeline":
            stages, shared = self.params
            stages, shared, self.opt_state, loss = self._step_fn(
                stages, shared, self.opt_state, tokens)
            self.params = (stages, shared)
        elif self.family == "moe":
            self.params, self.opt_state, loss, metrics = self._step_fn(
                self.params, self.opt_state, tokens)
            self.last_metrics = metrics
        else:
            self.params, self.opt_state, loss = self._step_fn(
                self.params, self.opt_state, tokens)
        self.step_num += 1
        if (self.tc.ckpt_dir is not None
                and self.step_num % self.tc.ckpt_every == 0):
            self.save()
        return loss

    def fit(self, batches: Iterator, *, steps: int,
            log: Callable[[str], None] = print) -> list[float]:
        """Run `steps` steps from `batches`; returns the loss history."""
        losses = []
        t0 = time.perf_counter()
        for _ in range(steps):
            tokens = next(batches)
            loss = self.train_step(tokens)
            losses.append(loss)
            if self.step_num % self.tc.log_every == 0:
                loss_f = float(loss)  # sync point, only when logging
                dt = time.perf_counter() - t0
                log(f"step {self.step_num}: loss={loss_f:.4f} "
                    f"({dt / max(len(losses), 1):.3f} s/step)")
        return [float(x) for x in losses]
