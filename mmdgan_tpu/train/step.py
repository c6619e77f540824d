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
  an elementwise ``jnp.where`` gates each optimizer's update so a single
  compiled step serves every schedule (no recompilation per mode; no
  per-scan-iteration buffer copies, unlike ``lax.cond``). When an update
  is skipped, optimizer slots are untouched — matching "op not run" TF
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
import numpy as np
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


def _gated_update(do, opt, grads, params, opt_state):
    """Gated optimizer application via elementwise select, NOT lax.cond:
    a cond whose identity branch returns the carried params forces XLA to
    copy every parameter buffer on each lax.scan iteration (the output
    can't alias both branches), which showed up as ~35% of step time in
    profiles. jnp.where with a scalar predicate fuses into the Adam
    update kernels and aliases in place. The update is computed
    unconditionally and discarded when gated off — the off path pays the
    (bandwidth-bound) update cost, but the common always-on path runs
    copy-free."""
    updates, new_opt = opt.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    sel = lambda n, o: jnp.where(do > 0, n, o)
    return (jax.tree.map(sel, new_params, params),
            jax.tree.map(sel, new_opt, opt_state))


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
        rng_code, rng_loss, rng_gp = jax.random.split(rng_step, 3)

        # Staged vjp: one generator forward, one discriminator forward,
        # ONE generator backward and two discriminator backward pulls.
        # Numerically identical to a joint vjp over (params_gen,
        # params_dis) with two cotangent pulls; XLA's DCE already prunes
        # the dead branches there (measured: same flops), but the staged
        # form makes the backward structure explicit and guaranteed
        # rather than reliant on compiler cleanup.
        def gen_fwd(params_gen):
            gen_out, gen_state, code_batch = model.gen_stage(
                params_gen, ts.net_state, rng_code, data_batch, train=True)
            return gen_out["x"], (gen_state, code_batch)

        gen_x, gen_vjp, (gen_state, code_batch) = jax.vjp(
            gen_fwd, ts.params["gen"], has_aux=True)

        def dis_fwd(params_dis, gx):
            loss_gen, loss_dis, dis_state, new_loss_state, aux = (
                model.dis_stage(
                    params_dis, gx, code_batch.get("y"), ts.net_state,
                    ts.loss_state, rng_loss, rng_gp, data_batch))
            return (loss_gen, loss_dis), (dis_state, new_loss_state, aux)

        losses, dis_vjp, (dis_state, new_loss_state, aux) = jax.vjp(
            dis_fwd, ts.params["dis"], gen_x, has_aux=True)
        loss_gen, loss_dis = losses
        one, zero = jnp.ones(()), jnp.zeros(())
        grads_dis, _ = dis_vjp((zero, one))
        _, gen_x_ct = dis_vjp((one, zero))
        (grads_gen,) = gen_vjp(gen_x_ct)
        new_net_state = {"gen": gen_state, "dis": dis_state}

        params_dis, opt_state_dis = _gated_update(
            do_dis, opt_dis, grads_dis, ts.params["dis"], ts.opt_state_dis)
        params_gen, opt_state_gen = _gated_update(
            do_gen, opt_gen, grads_gen, ts.params["gen"], ts.opt_state_gen)

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
        if model.do_summary:
            # global grad norms per net (the reference's per-gradient
            # histogram summaries, my_sngan.py:309-321, reduced to the
            # scalars that matter for divergence/vanishing diagnosis;
            # per-variable histograms are written host-side by the Agent)
            metrics["grad_norm_dis"] = optax.global_norm(grads_dis)
            metrics["grad_norm_gen"] = optax.global_norm(grads_gen)
        return new_ts, metrics

    return train_step


def build_grad_accum_step(
    model: SNGan,
    opt_dis: optax.GradientTransformation,
    opt_gen: optax.GradientTransformation,
    micro_batches: int,
) -> Callable:
    """One optimizer step over a global batch processed in M micro-batch
    chunks — global batch sizes whose ACTIVATIONS outgrow HBM (256²+
    images, or very large B) at 1/M activation memory for ~2x forward
    FLOPs (the gradient-checkpoint trade, scanned so only one
    micro-batch of activations is ever live).

    Exact global-batch MMD semantics — this is NOT loss averaging over
    micro-batches (the MMD kernel matrix is non-decomposable,
    math_func.py:1048-1069):

    1. a scores pass runs G and D per micro-batch (``lax.scan``, no
       residuals kept) and concatenates the tiny [B, d] score matrices;
    2. the loss and its score cotangents are computed ONCE on the full
       matrices — identical math to the fused step;
    3. a second scanned pass recomputes each micro-batch forward under
       ``jax.vjp`` and pulls the matching cotangent slices, accumulating
       parameter gradients. Gradient linearity makes the sum equal the
       full-batch gradient exactly (tested vs ``build_train_step``).

    The returned ``train_step(ts, data_batch, do_dis, do_gen)`` has the
    same signature/semantics as ``build_train_step`` (same rng stream:
    the z batch, loss rng, and LossState threading match the fused step
    bit-for-bit), so it drops into ``Agent.train`` unchanged.

    Deviations at M > 1: train-mode batch norm NORMALIZES each
    micro-batch by its own batch statistics (every framework's
    grad-accum behavior), and the per-step moving-statistics update is
    the AVERAGE of the per-micro-batch updates — for the linear EMA
    this folds the mean of the micro means (exactly the full-batch
    mean) and the mean of the micro variances (the within-micro part
    of the full-batch variance). SN power iteration is
    batch-independent and stays exact.

    Penalty/scale losses (``*_gp``, ``wasserstein``, ``*_ds``,
    my_sngan.py:152-240) accumulate exactly too: their witness/Jacobian
    terms are per-interpolate-row sums against the GLOBAL score
    matrices, so a third scanned pass computes each micro-batch's
    penalty contribution, its (second-order) direct D-parameter
    gradient, and — for the MMD witness penalties — its cotangents on
    the global ``s_x``/``s_gen``. Those score cotangents, weighted by
    the loss pull's d(loss_dis)/d(penalty), join the loss cotangents in
    pass 2; the direct parameter gradients add linearly after it. For
    the ``*_ds`` scale (a NONLINEAR 1/(w·mean(jaco)+1) of the batch
    mean), the mean accumulates across micros and the chain factor
    -w·scale² is applied once. All exact by gradient linearity (tested
    vs ``build_train_step`` on ``rmb_gp``/``wasserstein``/``rmb_ds``).
    """
    M = int(micro_batches)
    assert M >= 1, M
    GP_LOSSES = ("rep_gp", "rmb_gp", "fixed_g_gp", "fixed_t_gp")
    is_gp = model.loss_type in GP_LOSSES
    is_w = model.loss_type == "wasserstein"
    is_ds = model.loss_type in ("rep_ds", "rmb_ds")
    needs_gx = is_gp or is_w  # interpolates need the generated images

    from mmdgan_tpu.models.sngan import (
        decode_image_batch, jacobian_squared_frobenius_norm)

    def _split(a):
        """[B, ...] -> [M, B/M, ...] (None passes through)."""
        return None if a is None else a.reshape((M, -1) + a.shape[1:])

    def train_step(
        ts: TrainState,
        data_batch: Dict[str, Optional[Array]],
        do_dis: Array,
        do_gen: Array,
    ) -> Tuple[TrainState, Dict[str, Array]]:
        rng, rng_step = jax.random.split(ts.rng)
        rng_code, rng_loss, rng_gp = jax.random.split(rng_step, 3)

        B = data_batch["x"].shape[0]
        assert B % M == 0, (B, M)
        # the FULL code batch up front (scores are global; z is tiny) —
        # the identical stream build_train_step draws via gen_stage
        if model.sample_same_class and data_batch.get("y") is not None:
            code_batch = model.sample_codes(
                rng_code, B, code_y=data_batch["y"])
        else:
            code_batch = model.sample_codes(rng_code, B)

        mbs = {
            "x": _split(data_batch["x"]),
            "y": _split(data_batch.get("y")),
            "z": _split(code_batch["x"]),
            "zy": _split(code_batch.get("y")),
        }

        def micro_fwd(p_dis, p_gen, mb):
            db = decode_image_batch({"x": mb["x"], "y": mb["y"]})
            gen_out, gen_state = model.Gen.apply(
                p_gen, ts.net_state["gen"], {"x": mb["z"], "y": mb["zy"]},
                train=True)
            dis_in = model.concat_two_batches(
                db, {"x": gen_out["x"], "y": mb["zy"]})
            dis_out, dis_state = model.Dis.apply(
                p_dis, ts.net_state["dis"], dis_in, train=True)
            s_x, s_gen = jnp.split(dis_out["x"], 2, axis=0)
            return (s_gen, s_x), (gen_state, dis_state, gen_out["x"])

        # ---- pass 1: scores only (no residuals held). The penalized
        # losses additionally keep the generated IMAGES (one [B, H, W, C]
        # buffer — the same size as the input batch, not an activation
        # stack) for the interpolate pass below. ----
        def score_body(_, mb):
            (s_gen, s_x), (_, _, gx) = micro_fwd(
                ts.params["dis"], ts.params["gen"], mb)
            extra = gx if needs_gx else jnp.mean(jnp.abs(gx))
            return None, (s_gen, s_x, extra)

        _, (s_gen_m, s_x_m, gx_extra) = jax.lax.scan(score_body, None, mbs)
        s_gen = s_gen_m.reshape((B,) + s_gen_m.shape[2:])
        s_x = s_x_m.reshape((B,) + s_x_m.shape[2:])
        gx_abs_mean = jnp.mean(jnp.abs(gx_extra)) if needs_gx \
            else jnp.mean(gx_extra)

        # ---- penalty pass: witness/Jacobian terms per micro-batch ----
        # Per-interpolate-row structure makes them micro-decomposable:
        # row i's witness couples only to the GLOBAL score matrices
        # (constants of this pass; their cotangents are accumulated and
        # rejoin the loss pull below). Each vjp here is second-order —
        # grad-of-grad through D on one micro-batch of interpolates.
        zero_gd = jax.tree.map(jnp.zeros_like, ts.params["dis"])
        dis_penalty = dis_scale = None
        pen_gd = pen_csx = pen_csgen = jaco_gd = None
        if is_gp:
            # identical interpolation draw to the fused step's
            # mmd_gradient_penalty(rng_gp) internal sampling
            uni_m = _split(jax.random.uniform(rng_gp, (B, 1, 1, 1)))

            def pen_body(carry, mb):
                pen_s, gd_s, csx_s, csgen_s = carry

                def f(p_dis, sx_, sgen_):
                    return model.mmd_gradient_penalty(
                        p_dis, ts.net_state, rng_gp, mb["x"], mb["gx"],
                        sx_, sgen_, mode=model.loss_type,
                        labels=mb["y"], uni=mb["uni"])

                pen_i, pull_i = jax.vjp(f, ts.params["dis"], s_x, s_gen)
                gd_i, csx_i, csgen_i = pull_i(jnp.ones(()))
                return (pen_s + pen_i,
                        jax.tree.map(jnp.add, gd_s, gd_i),
                        csx_s + csx_i, csgen_s + csgen_i), None

            (pen_sum, pen_gd, pen_csx, pen_csgen), _ = jax.lax.scan(
                pen_body,
                (jnp.zeros(()), zero_gd,
                 jnp.zeros_like(s_x), jnp.zeros_like(s_gen)),
                {"x": mbs["x"], "gx": gx_extra, "y": mbs["y"],
                 "uni": uni_m})
            # mean over B rows = mean of the M equal micro means
            dis_penalty = model.gp_weight * pen_sum / M
        elif is_w:
            uni_m = _split(jax.random.uniform(rng_gp, (B, 1, 1, 1)))

            def pen_body(carry, mb):
                pen_s, gd_s = carry

                def f(p_dis):
                    return model.gradient_penalty(
                        p_dis, ts.net_state, rng_gp, mb["x"], mb["gx"],
                        labels=mb["y"], uni=mb["uni"])

                pen_i, pull_i = jax.vjp(f, ts.params["dis"])
                (gd_i,) = pull_i(jnp.ones(()))
                return (pen_s + pen_i,
                        jax.tree.map(jnp.add, gd_s, gd_i)), None

            (pen_sum, pen_gd), _ = jax.lax.scan(
                pen_body, (jnp.zeros(()), zero_gd),
                {"x": mbs["x"], "gx": gx_extra, "y": mbs["y"],
                 "uni": uni_m})
            dis_penalty = model.gp_weight * pen_sum / M
        elif is_ds:
            def ds_body(carry, mb):
                j_s, gd_s = carry

                def f(p_dis):
                    fwd = lambda xx: model._dis_fwd(
                        p_dis, ts.net_state, {"x": xx, "y": mb["y"]})
                    return jnp.mean(
                        jacobian_squared_frobenius_norm(fwd, mb["x"]))

                j_i, pull_i = jax.vjp(f, ts.params["dis"])
                (gd_i,) = pull_i(jnp.ones(()))
                return (j_s + j_i,
                        jax.tree.map(jnp.add, gd_s, gd_i)), None

            (jaco_sum, jaco_gd), _ = jax.lax.scan(
                ds_body, (jnp.zeros(()), zero_gd),
                {"x": mbs["x"], "y": mbs["y"]})
            mean_jaco = jaco_sum / M
            dis_scale = 1.0 / (model.penalty_weight * mean_jaco + 1.0)

        # ---- loss once on the global score matrices; penalty/scale are
        # differentiable inputs so the pull hands back d(loss)/d(pen) ----
        pen_in = dis_penalty if dis_penalty is not None else jnp.zeros(())
        scale_in = dis_scale if dis_scale is not None else jnp.ones(())

        def loss_fn(s_gen_, s_x_, pen_, scale_):
            lg, ld, new_ls, laux = model.loss_hp.apply(
                s_gen_, s_x_, model.loss_type,
                batch_size=B, d=model.score_size,
                dis_penalty=pen_ if (is_gp or is_w) else None,
                dis_scale=scale_ if is_ds else None,
                rng=rng_loss, state=ts.loss_state)
            return (lg, ld), (new_ls, laux)

        losses, pull, (new_loss_state, loss_aux) = jax.vjp(
            loss_fn, s_gen, s_x, pen_in, scale_in, has_aux=True)
        loss_gen, loss_dis = losses
        one, zero = jnp.ones(()), jnp.zeros(())
        # gen pull: pen/scale cotangents are structurally zero (both only
        # enter loss_dis) and the fused step discards any loss_gen ->
        # params_dis path anyway (its gen pull stops at gen_x)
        cg_sg, cg_sx, _, _ = pull((one, zero))   # dloss_gen/d(scores)
        cd_sg, cd_sx, cd_pen, cd_scale = pull((zero, one))
        if is_gp:
            # the witness penalty's global-score cotangents ride pass 2's
            # D pull, exactly the fused step's joint vjp chain
            w_pen = cd_pen * model.gp_weight / M
            cd_sx = cd_sx + w_pen * pen_csx
            cd_sg = cd_sg + w_pen * pen_csgen
        cts = {"cg_sg": _split(cg_sg), "cg_sx": _split(cg_sx),
               "cd_sg": _split(cd_sg), "cd_sx": _split(cd_sx)}

        # ---- pass 2: recompute each micro forward, accumulate grads ----
        zero_gg = jax.tree.map(jnp.zeros_like, ts.params["gen"])

        # state updates accumulate as a SUM of per-micro updates (each
        # computed from the step-start state) and divide by M after the
        # scan: for BN's linear EMA that is the update at the mean
        # micro-batch statistic; SN power vectors are batch-independent
        # (all M updates identical), so the average is a no-op there.
        # Non-float state leaves (if any) keep the last micro's value.
        def _zero_state(t):
            return jax.tree.map(
                lambda l: jnp.zeros_like(l)
                if jnp.issubdtype(l.dtype, jnp.inexact) else l, t)

        def _add_state(acc, new):
            return jax.tree.map(
                lambda a, n: a + n
                if jnp.issubdtype(n.dtype, jnp.inexact) else n, acc, new)

        def grad_body(carry, mb_ct):
            gd, gg, sacc = carry
            mb = {k: mb_ct[k] for k in ("x", "y", "z", "zy")}

            def f(p_dis, p_gen):
                scores, states = micro_fwd(p_dis, p_gen, mb)
                return scores, states

            _, pull2, (gen_state, dis_state, _) = jax.vjp(
                f, ts.params["dis"], ts.params["gen"], has_aux=True)
            gd_i, _ = pull2((mb_ct["cd_sg"], mb_ct["cd_sx"]))
            _, gg_i = pull2((mb_ct["cg_sg"], mb_ct["cg_sx"]))
            gd = jax.tree.map(jnp.add, gd, gd_i)
            gg = jax.tree.map(jnp.add, gg, gg_i)
            sacc = _add_state(sacc, {"gen": gen_state, "dis": dis_state})
            return (gd, gg, sacc), None

        (grads_dis, grads_gen, state_sum), _ = jax.lax.scan(
            grad_body,
            (zero_gd, zero_gg, _zero_state(ts.net_state)),
            {**mbs, **cts})
        new_net_state = jax.tree.map(
            lambda l: l / M
            if jnp.issubdtype(l.dtype, jnp.inexact) else l, state_sum)

        # direct (second-order) penalty parameter gradients, weighted by
        # the loss pull's penalty/scale cotangent — linear additions
        if is_gp or is_w:
            w_pen = cd_pen * model.gp_weight / M
            grads_dis = jax.tree.map(
                lambda g, p: g + w_pen * p, grads_dis, pen_gd)
        elif is_ds:
            # scale = 1/(w·mean+1)  =>  d(scale)/d(mean) = -w·scale²
            w_ds = cd_scale * (-model.penalty_weight * dis_scale ** 2) / M
            grads_dis = jax.tree.map(
                lambda g, p: g + w_ds * p, grads_dis, jaco_gd)

        params_dis, opt_state_dis = _gated_update(
            do_dis, opt_dis, grads_dis, ts.params["dis"], ts.opt_state_dis)
        params_gen, opt_state_gen = _gated_update(
            do_gen, opt_gen, grads_gen, ts.params["gen"], ts.opt_state_gen)

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
            "s_x_mean": jnp.mean(s_x),
            "s_gen_mean": jnp.mean(s_gen),
            "x_gen_abs_mean": gx_abs_mean,
            **loss_aux,
        }
        if model.do_summary:
            metrics["grad_norm_dis"] = optax.global_norm(grads_dis)
            metrics["grad_norm_gen"] = optax.global_norm(grads_gen)
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

    For imbalanced schedules use ``imbalanced_scan`` /
    ``build_imbalanced_multi_step`` — the flags are computed on device
    inside the scan there.
    """
    step = build_train_step(model, opt_dis, opt_gen)

    def multi_step(ts: TrainState, batches, do_dis: Array, do_gen: Array):
        def body(carry, batch):
            new_ts, metrics = step(carry, batch, do_dis, do_gen)
            return new_ts, metrics

        final_ts, metrics = jax.lax.scan(body, ts, batches, length=num_steps)
        return final_ts, metrics

    return multi_step


def build_imbalanced_multi_step(
    model: SNGan,
    opt_dis: optax.GradientTransformation,
    opt_gen: optax.GradientTransformation,
    num_steps: int,
    imbalanced,
) -> Callable:
    """K steps per launch WITH the imbalanced update schedule computed on
    device, so imbalanced/dynamic training also gets scan fusion (the
    host-side schedule forced one launch per step — ~30 ms dispatch on a
    tunneled chip).

    ``imbalanced`` is either ``[a, b]`` (update D when step % a == 0, G
    when step % b == 0 — a pure function of the carried global step) or
    ``'dynamic'`` (graph_func.py:916-919: D updates while step < 1000,
    then with probability 0.1 / max(mmd_average, 0.1); G always). The
    mmd average is an EMA of loss_gen carried through the scan (the
    reference's full_run never actually updates its average — a vestige;
    we keep the debug_mode semantics of tracking the loss).

    Returns ``fn(ts, batches, rng, mmd_avg) ->
    (new_ts, new_rng, new_mmd_avg, metrics)``.
    """
    return imbalanced_scan(
        build_train_step(model, opt_dis, opt_gen), num_steps, imbalanced)


def imbalanced_scan(step: Callable, num_steps: int, imbalanced) -> Callable:
    """Wrap an existing train step in the on-device imbalanced-schedule
    scan (see ``build_imbalanced_multi_step``)."""
    is_list = isinstance(imbalanced, (list, tuple))
    if not is_list and imbalanced != "dynamic":
        raise ValueError(f"imbalanced schedule {imbalanced!r} not supported")

    def multi_step(ts, batches, rng, mmd_avg):
        def body(carry, batch):
            ts, rng, avg = carry
            gstep = ts.step
            if is_list:
                do_dis = (gstep % imbalanced[0] == 0).astype(jnp.float32)
                do_gen = (gstep % imbalanced[1] == 0).astype(jnp.float32)
            else:
                rng, r_u = jax.random.split(rng)
                u = jax.random.uniform(r_u)
                do_dis = jnp.logical_or(
                    gstep < 1000,
                    u < 0.1 / jnp.maximum(avg, 0.1)).astype(jnp.float32)
                do_gen = jnp.ones(())
            new_ts, metrics = step(ts, batch, do_dis, do_gen)
            new_avg = 0.99 * avg + 0.01 * metrics["loss_gen"]
            metrics["do_dis"] = do_dis
            return (new_ts, rng, new_avg), metrics

        (ts, rng, mmd_avg), metrics = jax.lax.scan(
            body, (ts, rng, mmd_avg), batches, length=num_steps)
        return ts, rng, mmd_avg, metrics

    return multi_step


def same_class_tables(y, num_class: int):
    """Host-side per-class index tables for same-class device sampling
    (the reference's group_by_window batching, input_func.py:905-916).

    Returns (table [num_class, max_count] int32, counts [num_class]):
    ``table[c, :counts[c]]`` are the dataset rows of class c (rows are
    repeated to pad, harmless under uniform re-sampling).
    """
    import numpy as np

    y = np.asarray(y).reshape(-1)
    counts = np.asarray([(y == c).sum() for c in range(num_class)], np.int32)
    assert counts.min() > 0, "every class needs at least one example"
    width = int(counts.max())
    table = np.zeros((num_class, width), np.int32)
    for c in range(num_class):
        rows = np.nonzero(y == c)[0].astype(np.int32)
        table[c] = np.resize(rows, width)
    return table, counts


def sharded_same_class_tables(y, num_class: int, num_shards: int,
                              width: int = 0):
    """Per-DEVICE class tables for same-class sampling over a SHARDED
    HBM dataset: shard d holds the contiguous row block
    ``[d*N/D, (d+1)*N/D)`` (the ``P('data')`` layout), and its table
    indexes LOCAL rows of that block.

    Returns (tables [num_shards, num_class, width], counts
    [num_shards, num_class]); shard them with ``P(axis)`` so each device
    gets its own table. Asserts every class is present on every shard —
    true for any shuffled dataset of reasonable size (shuffle before
    upload if the source is class-sorted).

    ``width`` > 0 pins the table width instead of using the max local
    class count — multi-process SPMD callers pass ``width=local_n`` so
    every process's locally built tiles agree in shape and assemble into
    one global array (``jax.make_array_from_process_local_data``)
    without cross-host communication.
    """
    import numpy as np

    y = np.asarray(y).reshape(-1)
    n = y.shape[0]
    assert n % num_shards == 0, (
        f"dataset rows {n} must divide over {num_shards} devices")
    local_n = n // num_shards
    per_shard = [same_class_tables(y[d * local_n:(d + 1) * local_n],
                                   num_class) for d in range(num_shards)]
    max_count = max(t.shape[1] for t, _ in per_shard)
    if width:
        assert width >= max_count, (width, max_count)
    else:
        width = max_count
    tables = np.zeros((num_shards, num_class, width), np.int32)
    counts = np.zeros((num_shards, num_class), np.int32)
    for d, (t, c) in enumerate(per_shard):
        # repeat-pad to the common width (harmless under uniform draws
        # bounded by counts)
        tables[d] = np.stack([np.resize(t[k, :c[k]], width)
                              for k in range(num_class)])
        counts[d] = c
    return tables, counts


def class_schedule(num_class: int, n_steps: int, seed: int):
    """Host-side deterministic class schedule for ``same_class`` +
    ``sampling='shuffled_epochs'``: one global class draw per step plus
    that class's running draw count.

    Returns [n_steps, 2] int32 rows ``(c_t, k_t)`` where ``c_t`` is the
    class drawn at absolute step t and ``k_t`` = #{s < t : c_s == c_t}.
    Pure function of (seed, num_class) — a resumed run regenerates the
    identical schedule from the checkpointed step alone, so the
    without-replacement per-class streams continue exactly where they
    left off (the same contract ``EpochPermuter`` gives the
    unconditional sampler).
    """
    import numpy as np

    draws = np.random.RandomState(
        (seed * 1000003 + 777) % (2**31 - 1)).randint(
            0, num_class, size=n_steps).astype(np.int32)
    k = np.zeros(n_steps, np.int32)
    for c in range(num_class):
        pos = np.nonzero(draws == c)[0]
        k[pos] = np.arange(pos.size, dtype=np.int32)
    return np.stack([draws, k], axis=1)


def build_device_data_step(
    model: SNGan,
    opt_dis: optax.GradientTransformation,
    opt_gen: optax.GradientTransformation,
    num_steps: int,
    batch_size: int,
    same_class: bool = False,
    class_table=None,
    class_counts=None,
    sampling: str = "uniform",
    sampler_seed: int = 0,
    micro_batches: int = 1,
) -> Callable:
    """K train steps per launch with batches gathered ON DEVICE from an
    HBM-resident dataset — zero per-step host->device data transfer.

    For datasets that fit in HBM (CIFAR uint8 = 150 MB, CelebA 64x64 =
    2.4 GB), upload once and sample uniformly at random inside the scan.
    On a tunneled chip the host link (~0.08 GB/s) otherwise caps
    real-data training at ~60 (f32 feed) / ~220 (uint8 feed) steps/s vs
    ~460 steps/s compute; this path removes the data link entirely.

    ``sampling`` picks the batch strategy:

    - ``"uniform"`` (default): uniform-with-replacement random gather per
      step (the reference's 10k-element shuffle buffer over epoch
      repeats, input_func.py:905-916, approximates the same stationary
      distribution).
    - ``"shuffled_epochs"``: contiguous ``dynamic_slice`` batches indexed
      by ``ts.step`` — without-replacement epochs over a dataset the
      CALLER re-permutes at epoch boundaries (``Agent.train_device_data``
      does; tools/hbm_study.py: the random gather costs ~10% of the CIFAR
      step, the slice costs nothing — 412 vs 459 steps/s — and epoch
      semantics match the reference's shuffled-epoch pipeline more
      closely than with-replacement). Rows beyond the last full batch of
      an epoch are reshuffled into the next epoch's permutation.
      Combined with ``same_class`` the returned fn takes a trailing
      ``schedule`` argument ([num_steps, 2] int32 rows from
      ``class_schedule``): one global class draw per step, and each
      class consumes ITS OWN without-replacement epoch stream — row
      order within a class-epoch is a fresh uniform permutation derived
      on device from ``(sampler_seed, class, class_epoch)`` alone
      (argsort of fold_in-keyed uniforms), so no sampler state is
      carried and checkpoint resume replays the identical streams.
      This is the reference's ``group_by_window`` batching over a
      shuffled-epochs pipeline (input_func.py:905-916). Rows beyond the
      last full batch of a class-epoch reshuffle into that class's next
      epoch. Every class needs at least ``batch_size`` (per-device:
      ``batch_size/D``) rows.

    Returns ``fn(ts, data_x, data_y, rng, do_dis, do_gen) ->
    (new_ts, new_rng, metrics)``; ``data_x`` is the full [N, H, W, C]
    (uint8 or f32) dataset already on device, ``data_y`` [N, 1] labels or
    None.

    Multi-chip: use ``builder.with_mesh(mesh)`` on the returned function
    (and keep ``data_x`` sharded along axis 0 with ``P(axis)``) — each
    device then samples its batch_size/D local examples from its OWN
    dataset shard via ``shard_map`` (per-device RNG streams), so the
    dataset costs N/D memory per chip and sampling needs no collectives;
    the sampled batch comes out sharded exactly as the data-parallel
    step expects. Same-class batching works sharded too: pass
    ``sharded_same_class_tables(y, num_class, ndev)`` — one global class
    draw per step (class key not device-folded), per-device tables of
    local rows, still zero collectives.

    ``micro_batches`` > 1 swaps the inner step for
    ``build_grad_accum_step`` — the 512²-scale configuration: batches
    too large to tunnel-feed come from the HBM-resident dataset, and
    activations too large for a fused pass accumulate over M exact
    micro-batch chunks (same signature, so the sampler composes
    unchanged).
    """
    step = (build_train_step(model, opt_dis, opt_gen)
            if int(micro_batches) == 1 else
            build_grad_accum_step(model, opt_dis, opt_gen, micro_batches))

    assert sampling in ("uniform", "shuffled_epochs"), sampling
    scheduled = same_class and sampling == "shuffled_epochs"
    # multi-process SPMD: globally-assembled tables span non-addressable
    # devices, which jit cannot close over ("pass such arrays as
    # arguments") — the returned fn then takes (class_table,
    # class_counts) as trailing arguments instead
    tables_global = same_class and isinstance(class_table, jax.Array)
    if same_class:
        assert class_table is not None and class_counts is not None, (
            "same_class sampling needs same_class_tables(y, num_class)")
        if scheduled and not tables_global:
            # (multi-process global count arrays can't be fetched here;
            # the trainer asserts its process-local counts instead)
            import numpy as np_

            cnt_host = np_.asarray(class_counts)
            # per-device local batch is validated again in the mesh
            # branch; here guard the replicated case
            if cnt_host.ndim == 1:
                assert int(cnt_host.min()) >= batch_size, (
                    f"same_class + shuffled_epochs needs every class to "
                    f"hold >= batch_size rows; min count "
                    f"{int(cnt_host.min())} < {batch_size}")

    def _sampler(data_x, data_y, mesh, axis, tbl_in=None, cnt_in=None):
        # every sampler takes (rng, step): step indexes shuffled-epoch
        # slices; the uniform/gather samplers ignore it
        base_key = jax.random.PRNGKey(sampler_seed) if scheduled else None

        def _class_epoch_slots(key, count, width, offset, local_batch):
            # Uniform permutation of this class's valid slots for one
            # class-epoch: argsort of keyed uniforms with padded slots
            # pushed past the valid prefix; the slice stays inside
            # [0, count - local_batch] by construction (offset =
            # (k % (count // local_batch)) * local_batch).
            keys = jax.random.uniform(key, (width,))
            keys = jnp.where(jnp.arange(width) < count, keys, jnp.inf)
            perm = jnp.argsort(keys)
            return jax.lax.dynamic_slice_in_dim(perm, offset, local_batch)

        if mesh is None:
            n = data_x.shape[0]

            if scheduled:
                tbl = jnp.asarray(class_table)    # [C, width]
                cnt = jnp.asarray(class_counts)   # [C]
                width = tbl.shape[1]

                def sample(rng, step_count, sched):
                    c, k = sched[0], sched[1]
                    dpe = jnp.maximum(cnt[c] // batch_size, 1)
                    e = k // dpe
                    off = (k % dpe) * batch_size
                    key = jax.random.fold_in(
                        jax.random.fold_in(base_key, c), e)
                    slots = _class_epoch_slots(
                        key, cnt[c], width, off, batch_size)
                    idx = tbl[c, slots]
                    return {
                        "x": jnp.take(data_x, idx, axis=0),
                        "y": (jnp.full((batch_size, 1), c, jnp.int32)
                              if data_y is None
                              else jnp.take(data_y, idx, axis=0)),
                    }

                return sample

            if sampling == "shuffled_epochs":
                n_batches = n // batch_size
                assert n_batches >= 1, (n, batch_size)

                def sample(rng, step_count):
                    off = (step_count % n_batches) * batch_size
                    x = jax.lax.dynamic_slice_in_dim(
                        data_x, off, batch_size, axis=0)
                    y = (None if data_y is None else
                         jax.lax.dynamic_slice_in_dim(
                             data_y, off, batch_size, axis=0))
                    return {"x": x, "y": y}

                return sample

            if same_class:
                table = jnp.asarray(class_table)
                counts = jnp.asarray(class_counts)

                def sample(rng, step_count):
                    # whole batch from ONE uniformly drawn class
                    # (group_by_window semantics, input_func.py:905-916)
                    r_c, r_i = jax.random.split(rng)
                    c = jax.random.randint(r_c, (), 0, table.shape[0])
                    slot = jax.random.randint(r_i, (batch_size,), 0, counts[c])
                    idx = table[c, slot]
                    return {
                        "x": jnp.take(data_x, idx, axis=0),
                        "y": (jnp.full((batch_size, 1), c, jnp.int32)
                              if data_y is None
                              else jnp.take(data_y, idx, axis=0)),
                    }

                return sample

            def sample(rng, step_count):
                idx = jax.random.randint(rng, (batch_size,), 0, n)
                return {
                    "x": jnp.take(data_x, idx, axis=0),
                    "y": None if data_y is None
                    else jnp.take(data_y, idx, axis=0),
                }

            return sample

        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        ndev = mesh.shape[axis]
        assert batch_size % ndev == 0, (
            f"batch {batch_size} must divide over {ndev} devices")
        local_b = batch_size // ndev

        if scheduled:
            # Sharded same_class + shuffled_epochs: the SAME global class
            # schedule on every device (replicated [2] row), per-device
            # without-replacement streams over LOCAL rows — each shard's
            # class-epoch length is its own local count, permutation keys
            # fold in the device index. Zero collectives, no carried
            # sampler state.
            tbl = tbl_in if tbl_in is not None else jnp.asarray(class_table)
            cnt = cnt_in if cnt_in is not None else jnp.asarray(class_counts)
            assert tbl.ndim == 3 and tbl.shape[0] == ndev, (
                f"sharded same_class needs sharded_same_class_tables(y, "
                f"num_class, {ndev}); got table shape {tbl.shape}")
            if hasattr(class_counts, "min") and not isinstance(
                    class_counts, jax.Array):
                import numpy as np_
                cmin = int(np_.asarray(class_counts).min())
                assert cmin >= local_b, (
                    f"same_class + shuffled_epochs needs every class to "
                    f"hold >= batch/D = {local_b} rows on every shard; "
                    f"min local count {cmin}")
            width = tbl.shape[2]

            def local_sample_sce(sched, xs, ys, tb, ct):
                c, k = sched[0, 0], sched[0, 1]
                dev = jax.lax.axis_index(axis)
                dpe = jnp.maximum(ct[0, c] // local_b, 1)
                e = k // dpe
                off = (k % dpe) * local_b
                key = jax.random.fold_in(jax.random.fold_in(
                    jax.random.fold_in(base_key, dev), c), e)
                slots = _class_epoch_slots(key, ct[0, c], width, off, local_b)
                idx = tb[0, c, slots]
                x = jnp.take(xs, idx, axis=0)
                y = (jnp.full((local_b, 1), c, jnp.int32) if ys is None
                     else jnp.take(ys, idx, axis=0))
                return x, y

            if data_y is None:
                smap = shard_map(
                    lambda sched, xs, tb, ct: local_sample_sce(
                        sched, xs, None, tb, ct),
                    mesh=mesh,
                    in_specs=(P(None), P(axis), P(axis), P(axis)),
                    out_specs=(P(axis), P(axis)),
                )

                def sample(rng, step_count, sched):
                    x, y = smap(sched[None], data_x, tbl, cnt)
                    return {"x": x, "y": y}
            else:
                smap = shard_map(
                    local_sample_sce, mesh=mesh,
                    in_specs=(P(None), P(axis), P(axis), P(axis), P(axis)),
                    out_specs=(P(axis), P(axis)),
                )

                def sample(rng, step_count, sched):
                    x, y = smap(sched[None], data_x, data_y, tbl, cnt)
                    return {"x": x, "y": y}

            return sample

        if same_class:
            # Sharded same-class sampling (VERDICT r2 item 6): ONE global
            # class draw per step — the class key is NOT folded with the
            # device index, so every chip draws the same class from the
            # same rng — then per-device row slots from per-device tables
            # of LOCAL rows (sharded_same_class_tables). Matches the
            # replicated sampler's group_by_window semantics
            # (input_func.py:905-916) with zero collectives.
            tbl = tbl_in if tbl_in is not None else jnp.asarray(class_table)
            cnt = cnt_in if cnt_in is not None else jnp.asarray(class_counts)
            assert tbl.ndim == 3 and tbl.shape[0] == ndev, (
                f"sharded same_class needs sharded_same_class_tables(y, "
                f"num_class, {ndev}); got table shape {tbl.shape}")

            def local_sample_sc(rng, xs, ys, tb, ct):
                r_c, r_i = jax.random.split(rng[0])
                c = jax.random.randint(r_c, (), 0, tb.shape[1])
                dev = jax.lax.axis_index(axis)
                slot = jax.random.randint(
                    jax.random.fold_in(r_i, dev), (local_b,), 0, ct[0, c])
                idx = tb[0, c, slot]
                x = jnp.take(xs, idx, axis=0)
                y = (jnp.full((local_b, 1), c, jnp.int32) if ys is None
                     else jnp.take(ys, idx, axis=0))
                return x, y

            if data_y is None:
                smap = shard_map(
                    lambda rng, xs, tb, ct: local_sample_sc(
                        rng, xs, None, tb, ct),
                    mesh=mesh,
                    in_specs=(P(None), P(axis), P(axis), P(axis)),
                    out_specs=(P(axis), P(axis)),
                )

                def sample(rng, step_count):
                    x, y = smap(rng[None], data_x, tbl, cnt)
                    return {"x": x, "y": y}
            else:
                smap = shard_map(
                    local_sample_sc, mesh=mesh,
                    in_specs=(P(None), P(axis), P(axis), P(axis), P(axis)),
                    out_specs=(P(axis), P(axis)),
                )

                def sample(rng, step_count):
                    x, y = smap(rng[None], data_x, data_y, tbl, cnt)
                    return {"x": x, "y": y}

            return sample

        def local_idx(rng, n_local):
            # distinct stream per device; indices into this chip's rows
            dev = jax.lax.axis_index(axis)
            r = jax.random.fold_in(rng[0], dev)
            return jax.random.randint(r, (local_b,), 0, n_local)

        if sampling == "shuffled_epochs":
            # per-device contiguous slice of the LOCAL shard at the same
            # epoch offset (each chip cycles its own rows; the caller
            # re-permutes every shard at epoch boundaries). Zero gather,
            # zero collectives.
            def local_slice(step_arr, xs):
                nb = xs.shape[0] // local_b
                off = (step_arr[0] % nb) * local_b
                return jax.lax.dynamic_slice_in_dim(xs, off, local_b, axis=0)

            if data_y is None:
                smap = shard_map(
                    local_slice, mesh=mesh,
                    in_specs=(P(None), P(axis)), out_specs=P(axis),
                )

                def sample(rng, step_count):
                    return {"x": smap(jnp.reshape(step_count, (1,)), data_x),
                            "y": None}
            else:
                smap = shard_map(
                    lambda s, xs, ys: (local_slice(s, xs), local_slice(s, ys)),
                    mesh=mesh,
                    in_specs=(P(None), P(axis), P(axis)),
                    out_specs=(P(axis), P(axis)),
                )

                def sample(rng, step_count):
                    x, y = smap(jnp.reshape(step_count, (1,)), data_x, data_y)
                    return {"x": x, "y": y}

            return sample

        if data_y is None:
            smap = shard_map(
                lambda rng, xs: jnp.take(xs, local_idx(rng, xs.shape[0]), axis=0),
                mesh=mesh, in_specs=(P(None), P(axis)), out_specs=P(axis),
            )

            def sample(rng, step_count):
                return {"x": smap(rng[None], data_x), "y": None}
        else:
            def local_sample(rng, xs, ys):
                idx = local_idx(rng, xs.shape[0])
                return jnp.take(xs, idx, axis=0), jnp.take(ys, idx, axis=0)

            smap = shard_map(
                local_sample, mesh=mesh,
                in_specs=(P(None), P(axis), P(axis)),
                out_specs=(P(axis), P(axis)),
            )

            def sample(rng, step_count):
                x, y = smap(rng[None], data_x, data_y)
                return {"x": x, "y": y}

        return sample

    def make(mesh=None, axis: str = "data", imbalanced=None):
        """``imbalanced``: None (use the passed do_dis/do_gen flags), an
        [a, b] period list, or 'dynamic' — the schedule is then computed
        on device per step like ``imbalanced_scan``. With ``imbalanced``
        set the returned fn has signature ``fn(ts, data_x, data_y, rng,
        mmd_avg) -> (ts, rng, mmd_avg, metrics)`` (the loss EMA carries
        across calls)."""
        is_list = isinstance(imbalanced, (list, tuple))
        assert not (scheduled and imbalanced is not None), (
            "same_class + shuffled_epochs is not combinable with "
            "imbalanced schedules (the class schedule is step-indexed)")

        if scheduled:
            def _sched_core(ts, data_x, data_y, rng, do_dis, do_gen,
                            schedule, tbl=None, cnt=None):
                sample = _sampler(data_x, data_y, mesh, axis, tbl, cnt)

                def body(carry, sched):
                    ts, rng = carry
                    rng, r_idx = jax.random.split(rng)
                    batch = sample(r_idx, ts.step, sched)
                    new_ts, metrics = step(ts, batch, do_dis, do_gen)
                    return (new_ts, rng), metrics

                (final_ts, rng), metrics = jax.lax.scan(
                    body, (ts, rng), schedule, length=num_steps)
                return final_ts, rng, metrics

            if tables_global:
                def multi_step_sched(ts, data_x, data_y, rng,
                                     do_dis: Array, do_gen: Array,
                                     schedule, class_table, class_counts):
                    return _sched_core(ts, data_x, data_y, rng, do_dis,
                                       do_gen, schedule, class_table,
                                       class_counts)
            else:
                def multi_step_sched(ts, data_x, data_y, rng,
                                     do_dis: Array, do_gen: Array,
                                     schedule):
                    return _sched_core(ts, data_x, data_y, rng, do_dis,
                                       do_gen, schedule)

            multi_step_sched.sampler = (
                lambda data_x, data_y=None, tbl=None, cnt=None: _sampler(
                    data_x, data_y, mesh, axis, tbl, cnt))
            return multi_step_sched

        def body_core(carry, sample):
            ts, rng, avg = carry
            rng, r_idx = jax.random.split(rng)
            batch = sample(r_idx, ts.step)
            if is_list:
                dd = (ts.step % imbalanced[0] == 0).astype(jnp.float32)
                dg = (ts.step % imbalanced[1] == 0).astype(jnp.float32)
            else:  # dynamic (graph_func.py:916-919)
                rng, r_u = jax.random.split(rng)
                u = jax.random.uniform(r_u)
                dd = jnp.logical_or(
                    ts.step < 1000,
                    u < 0.1 / jnp.maximum(avg, 0.1)).astype(jnp.float32)
                dg = jnp.ones(())
            new_ts, metrics = step(ts, batch, dd, dg)
            new_avg = 0.99 * avg + 0.01 * metrics["loss_gen"]
            metrics["do_dis"] = dd
            return (new_ts, rng, new_avg), metrics

        assert not (tables_global and imbalanced is not None), (
            "multi-process same_class tables are not combinable with "
            "imbalanced schedules")
        if imbalanced is not None:
            def multi_step_imb(ts, data_x, data_y, rng, mmd_avg):
                sample = _sampler(data_x, data_y, mesh, axis)
                (ts, rng, mmd_avg), metrics = jax.lax.scan(
                    lambda c, _: body_core(c, sample),
                    (ts, rng, mmd_avg), None, length=num_steps)
                return ts, rng, mmd_avg, metrics

            multi_step_imb.sampler = (
                lambda data_x, data_y=None: _sampler(data_x, data_y, mesh, axis))
            return multi_step_imb

        def _uniform_core(ts, data_x, data_y, rng, do_dis, do_gen,
                          tbl=None, cnt=None):
            sample = _sampler(data_x, data_y, mesh, axis, tbl, cnt)

            def body(carry, _):
                ts, rng = carry
                rng, r_idx = jax.random.split(rng)
                batch = sample(r_idx, ts.step)
                new_ts, metrics = step(ts, batch, do_dis, do_gen)
                return (new_ts, rng), metrics

            (final_ts, rng), metrics = jax.lax.scan(
                body, (ts, rng), None, length=num_steps)
            return final_ts, rng, metrics

        if tables_global:
            def multi_step(ts, data_x, data_y, rng, do_dis: Array,
                           do_gen: Array, class_table, class_counts):
                return _uniform_core(ts, data_x, data_y, rng, do_dis,
                                     do_gen, class_table, class_counts)
        else:
            def multi_step(ts, data_x, data_y, rng,
                           do_dis: Array, do_gen: Array):
                return _uniform_core(ts, data_x, data_y, rng,
                                     do_dis, do_gen)

        # exposed for tests: the exact batch-sampling closure the scan
        # uses, as sample(rng, step) -> batch
        multi_step.sampler = (
            lambda data_x, data_y=None, tbl=None, cnt=None: _sampler(
                data_x, data_y, mesh, axis, tbl, cnt))
        return multi_step

    fn = make()
    fn.with_mesh = make
    return fn


class EpochPermuter:
    """Per-epoch dataset permutations for ``sampling='shuffled_epochs'``.

    Non-cumulative scheme: the dataset layout for epoch ``e`` is
    ``orig[perm(e)]`` with ``perm(e)`` computed by ``make_perm(e)`` from
    the seed and epoch number alone — so a resumed run replays the exact
    same shuffles (``perm(0)`` is the identity, represented as None).
    Applied incrementally as ``delta = inv(perm(prev)) o perm(e)`` — one
    device-side take per epoch, no second dataset copy held.

    :param make_perm: e -> np int array ([n] or [ndev, local_n]) for e>=1
    :param permute: (arrs, delta_np) -> permuted arrs (device-side take)
    """

    def __init__(self, make_perm: Callable, permute: Callable):
        self._make = make_perm
        self._permute = permute
        self.epoch = 0
        self._perm = None

    @staticmethod
    def _perm_seed(seed: int, epoch: int, device: int = 0) -> int:
        """The (seed, epoch[, device]) -> RandomState-seed derivation.
        Single source of truth: single-device and sharded permuters must
        stay bitwise-consistent or resumed runs replay different
        shuffles than the documented deterministic contract."""
        return (seed * 1000003 + epoch * 641 + device * 7919) % (2**31 - 1)

    @classmethod
    def single_device(cls, n: int, seed: int) -> "EpochPermuter":
        """Permuter over an unsharded [n, ...] HBM dataset (jnp.take)."""

        def make_perm(e):
            return np.random.RandomState(
                cls._perm_seed(seed, e)).permutation(n)

        take = jax.jit(lambda a, p: jnp.take(a, p, axis=0))

        def permute(arrs, delta):
            d = jnp.asarray(delta.astype(np.int32))
            return [None if a is None else take(a, d) for a in arrs]

        return cls(make_perm, permute)

    @classmethod
    def sharded(cls, local_n: int, ndev: int, seed: int, mesh,
                axis: str) -> "EpochPermuter":
        """Permuter over a [ndev*local_n, ...] HBM dataset sharded over
        ``axis``: an independent permutation stream per device shard,
        applied locally via shard_map (no cross-device traffic)."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        def make_perm(e):
            return np.stack([
                np.random.RandomState(
                    cls._perm_seed(seed, e, d)).permutation(local_n)
                for d in range(ndev)])

        psh = NamedSharding(mesh, P(axis))
        apply_ = jax.jit(shard_map(
            lambda a, p: jnp.take(a, p[0], axis=0),
            mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P(axis)))

        def permute(arrs, delta):
            d = jax.device_put(delta.astype(np.int32), psh)
            return [None if a is None else apply_(a, d) for a in arrs]

        return cls(make_perm, permute)

    def advance(self, e_now: int, arrs):
        """Bring ``arrs`` to epoch ``e_now``'s layout (no-op if there)."""
        if e_now == self.epoch:
            return arrs
        prev = self._perm
        cur = None if e_now == 0 else self._make(e_now)
        self.epoch, self._perm = e_now, cur
        if prev is None:
            delta = cur
        else:
            inv = np.argsort(prev, axis=-1)
            if cur is None:
                delta = inv
            elif inv.ndim == 2:
                delta = np.take_along_axis(inv, cur, axis=-1)
            else:
                delta = inv[cur]
        return arrs if delta is None else self._permute(arrs, delta)


def build_eval_step(model: SNGan) -> Callable:
    """Eval-mode generation step: (ts, rng, batch_size) -> images."""

    def eval_step(ts: TrainState, rng: Array, batch_size: int) -> Array:
        return model.generate(ts.params, ts.net_state, rng=rng, batch_size=batch_size)

    return eval_step
