"""Train state and optimizer.

Optimizer replicates the reference recipe: Adam with betas (0.5, 0.999)
(reference main.py:236-237) under a OneCycle learning-rate schedule peaking
at 1e-4 (main.py:239-240). The reference constructs OneCycleLR with
`total_steps=num_epoch` and steps it once per *epoch* (main.py:311); we keep
that epoch-granular sampling by default (`epoch_granularity=True`) while
supporting the smoother per-step schedule too.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    """Replicated training state pytree."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
            batch_stats=(
                self.batch_stats if new_batch_stats is None else new_batch_stats
            ),
        )


def onecycle_schedule(
    num_epochs: int,
    steps_per_epoch: int,
    peak_lr: float = 1e-4,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
    epoch_granularity: bool = True,
) -> optax.Schedule:
    """OneCycle (cosine) schedule matching torch OneCycleLR defaults. With
    `epoch_granularity` the lr changes once per epoch, replicating the
    reference's per-epoch scheduler stepping against total_steps=num_epoch
    (main.py:239,311)."""
    def torch_onecycle(total_steps: int) -> optax.Schedule:
        # Exact torch OneCycleLR 'cos' formula, including its off-by-one
        # phase boundaries (warmup spans steps 0 .. pct_start*total - 1).
        initial = peak_lr / div_factor
        final = initial / final_div_factor
        warm_end = float(pct_start * total_steps) - 1.0
        anneal_end = float(total_steps - 1) - warm_end

        def sched(step):
            s = jnp.asarray(step, jnp.float32)
            warm_pct = jnp.clip(s / jnp.maximum(warm_end, 1e-9), 0.0, 1.0)
            up = peak_lr + (initial - peak_lr) / 2.0 * (1.0 + jnp.cos(jnp.pi * warm_pct))
            down_pct = jnp.clip((s - warm_end) / jnp.maximum(anneal_end, 1e-9), 0.0, 1.0)
            down = final + (peak_lr - final) / 2.0 * (1.0 + jnp.cos(jnp.pi * down_pct))
            return jnp.where(s <= warm_end, up, down)

        return sched

    if epoch_granularity:
        base = torch_onecycle(num_epochs)
        return lambda step: base(step // steps_per_epoch)
    return torch_onecycle(num_epochs * steps_per_epoch)


def make_optimizer(
    schedule: optax.Schedule,
    b1: float = 0.5,
    b2: float = 0.999,
    clip_grad_norm: float = 0.0,
    guard_nonfinite: bool = True,
) -> optax.GradientTransformation:
    """Adam(b1, b2) under the schedule (reference main.py:236-240), plus two
    robustness layers the reference lacks: optional global-norm gradient
    clipping and a non-finite-update guard (a step whose gradients contain
    NaN/inf is skipped rather than poisoning the parameters — occasional bad
    steps were observed on flaky accelerator workers)."""
    chain = []
    if clip_grad_norm and clip_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(clip_grad_norm))
    chain.append(optax.adam(schedule, b1=b1, b2=b2))
    tx = optax.chain(*chain) if len(chain) > 1 else chain[0]
    if guard_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=1000)
    return tx


def create_train_state(
    model,
    rng: jax.Array,
    sample_img,
    sample_mask,
    tx: optax.GradientTransformation,
) -> TrainState:
    variables = model.init(rng, sample_img, sample_mask)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def param_count(state: TrainState) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(state.params))
