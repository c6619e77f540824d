"""The fused train step: one jit/pjit region per optimization step.

Everything the reference ran inside one ``sess.run`` (data consume, both
network forwards, both losses, both optimizer updates, SN power-iteration
updates, BN moving-average updates — graph_func.py:853-854) is one pure
function here, compiled once by XLA.

TPU-first details:

- ONE shared forward for both losses: ``jax.vjp`` gives both cotangent
  pulls (dloss_gen/dG, dloss_dis/dD) from a single forward pass — exactly
  the reference's two ``compute_gradients`` on one graph
  (my_sngan.py:301-305), with no duplicated compute.
- Imbalanced update schedules (graph_func.py:876-942) are traced booleans:
  ``lax.cond`` gates each optimizer's update so a single compiled step
  serves every schedule (no recompilation per mode). When an update is
  skipped, optimizer slots are untouched — matching "op not run" TF
  semantics; SN/BN state still updates every step like UPDATE_OPS did.
- Data parallelism: the step is written with global-batch semantics; under
  ``jit`` with a sharded batch over a Mesh (see ``parallel/mesh.py``) XLA
  inserts the ICI collectives (gradient psums, score all-gathers for the
  global B x B kernel matrix) automatically.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mmdgan_tpu.models.sngan import SNGan
from mmdgan_tpu.train.state import TrainState

Array = jnp.ndarray


def init_train_state(
    model: SNGan,
    key: Array,
    opt_dis: optax.GradientTransformation,
    opt_gen: optax.GradientTransformation,
) -> TrainState:
    k_init, k_run = jax.random.split(key)
    params, net_state, loss_state = model.init(k_init)
    return TrainState(
        params=params,
        net_state=net_state,
        loss_state=loss_state,
        opt_state_dis=opt_dis.init(params["dis"]),
        opt_state_gen=opt_gen.init(params["gen"]),
        step=jnp.zeros((), jnp.int32),
        rng=k_run,
    )


def build_train_step(
    model: SNGan,
    opt_dis: optax.GradientTransformation,
    opt_gen: optax.GradientTransformation,
) -> Callable:
    """Returns ``train_step(ts, data_batch, do_dis, do_gen) ->
    (new_ts, metrics)``; jit/pjit it at the call site (the Agent and the
    mesh helpers do)."""

    def train_step(
        ts: TrainState,
        data_batch: Dict[str, Optional[Array]],
        do_dis: Array,
        do_gen: Array,
    ) -> Tuple[TrainState, Dict[str, Array]]:
        rng, rng_step = jax.random.split(ts.rng)

        def loss_fn(params_gen, params_dis):
            loss_gen, loss_dis, new_state, new_loss_state, aux = (
                model.compute_losses(
                    {"gen": params_gen, "dis": params_dis},
                    ts.net_state, ts.loss_state, rng_step, data_batch,
                    train=True,
                )
            )
            return (loss_gen, loss_dis), (new_state, new_loss_state, aux)

        losses, vjp_fn, (new_net_state, new_loss_state, aux) = jax.vjp(
            loss_fn, ts.params["gen"], ts.params["dis"], has_aux=True
        )
        loss_gen, loss_dis = losses
        one, zero = jnp.ones(()), jnp.zeros(())
        grads_gen, _ = vjp_fn((one, zero))
        _, grads_dis = vjp_fn((zero, one))

        def upd_dis(args):
            params_dis, opt_state = args
            updates, new_opt = opt_dis.update(grads_dis, opt_state, params_dis)
            return optax.apply_updates(params_dis, updates), new_opt

        def upd_gen(args):
            params_gen, opt_state = args
            updates, new_opt = opt_gen.update(grads_gen, opt_state, params_gen)
            return optax.apply_updates(params_gen, updates), new_opt

        params_dis, opt_state_dis = jax.lax.cond(
            do_dis, upd_dis, lambda a: a, (ts.params["dis"], ts.opt_state_dis)
        )
        params_gen, opt_state_gen = jax.lax.cond(
            do_gen, upd_gen, lambda a: a, (ts.params["gen"], ts.opt_state_gen)
        )

        new_ts = TrainState(
            params={"gen": params_gen, "dis": params_dis},
            net_state=new_net_state,
            loss_state=new_loss_state,
            opt_state_dis=opt_state_dis,
            opt_state_gen=opt_state_gen,
            step=ts.step + 1,
            rng=rng,
        )
        metrics = {
            "loss_gen": loss_gen,
            "loss_dis": loss_dis,
            **aux,
        }
        return new_ts, metrics

    return train_step


def build_multi_step(
    model: SNGan,
    opt_dis: optax.GradientTransformation,
    opt_gen: optax.GradientTransformation,
    num_steps: int,
) -> Callable:
    """K train steps fused into one ``lax.scan`` launch.

    Dispatch latency (host -> device, ~1 ms on a tunneled chip) dominates
    a ~1 ms train step; scanning K steps per call amortizes it K-fold.
    Takes a K-stacked batch dict ({'x': [K, B, H, W, C]}) and fixed
    (do_dis, do_gen) flags; returns the final state and the per-step
    metrics stacked along axis 0.

    Imbalanced schedules that change within the window need the single-step
    path; the Agent uses multi-step only when the schedule is constant.
    """
    step = build_train_step(model, opt_dis, opt_gen)

    def multi_step(ts: TrainState, batches, do_dis: Array, do_gen: Array):
        def body(carry, batch):
            new_ts, metrics = step(carry, batch, do_dis, do_gen)
            return new_ts, metrics

        final_ts, metrics = jax.lax.scan(body, ts, batches, length=num_steps)
        return final_ts, metrics

    return multi_step


def build_eval_step(model: SNGan) -> Callable:
    """Eval-mode generation step: (ts, rng, batch_size) -> images."""

    def eval_step(ts: TrainState, rng: Array, batch_size: int) -> Array:
        return model.generate(ts.params, ts.net_state, rng=rng, batch_size=batch_size)

    return eval_step
