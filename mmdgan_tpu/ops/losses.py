"""GAN loss catalogue — functional rebuild of the reference ``GANLoss``
dispatcher (``GeneralTools/math_func.py:2088-2668``).

Every loss is a pure function ``(scores, rng, state) -> (loss_gen, loss_dis,
new_state, aux)``:

- ``rng`` is a JAX PRNG key; losses that sample (omega in rand_g, the mix
  coin, instance noise) consume it. Deterministic losses ignore it.
- ``state`` is a :class:`LossState` pytree replacing the reference's
  non-trainable TF variables updated through UPDATE_OPS (moving loss
  averages, mixing probability, instance-noise sigma;
  math_func.py:1981-2035, 2061-2085, 2470-2498).
- ``aux`` is a dict of diagnostics replacing TF summaries: the kernel
  means e_kxx/e_kxy/e_kyy for every MMD loss (math_func.py:1329-1333),
  Newton-``beta`` for the rand_* family, the mix-coin / instance-noise
  state scalars, penalty magnitudes, and (when
  ``summary_histograms=True``) fixed-bin histograms of the pairwise
  distances and scores (math_func.py:806-838) under ``hist/*`` keys.
  ``GANLoss.apply`` returns it as the fourth element; the train step
  forwards it into the step metrics and the ``MetricWriter``.

Loss types supported (dispatch table mirrors math_func.py:2600-2651):
  logistic | hinge | wasserstein
  fixed_g / mmd_g | mgb | fixed_t / mmd_t
  mmd_g_mix / fixed_g_mix | sgm
  rand_g | rgb | rand_g_mix | sym_rg_mix | sym_rg / sym_rand_g
  instance_noise / ins_noise
  rep / rep_mmd_g / rep_gp / rep_ds            (repulsive)
  rmb / rep_b / rep_mmd_b / rmb_gp / rmb_ds    (repulsive bounded)
  test
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmdgan_tpu.ops.distance import get_squared_dist, slice_pairwise_distance
from mmdgan_tpu.ops.kernels import (
    cramer,
    mixture_mmd_g,
    mixture_mmd_t,
    mmd_g,
    mmd_g_bounded,
    rand_mmd_g_xn,
    rand_mmd_g_xy,
    rand_mmd_g_xy_bounded,
)

Array = jnp.ndarray

# Fixed-bin histogram metadata for the ``hist/*`` aux keys. Jit needs
# static shapes, so (unlike TF's dynamic-bin summaries) bins are fixed:
# pairwise score distances live in [0, ~16] for sigma~1 kernels (which
# saturate beyond d~8 anyway); SN-discriminator scores in [-8, 8]. The
# first/last bin absorb out-of-range mass (clipped), so nothing is lost
# silently. The writer uses these ranges to reconstruct bin edges.
HIST_NBINS = 64
HIST_RANGES = {
    "hist/d_xx": (0.0, 16.0),
    "hist/d_xy": (0.0, 16.0),
    "hist/d_yy": (0.0, 16.0),
    "hist/score_gen": (-8.0, 8.0),
    "hist/score_x": (-8.0, 8.0),
}


def fixed_bin_histogram(x: Array, lo: float, hi: float,
                        nbins: int = HIST_NBINS) -> Array:
    """Histogram with static bin count/range (jit- and scan-friendly
    stand-in for the reference's TB histogram summaries,
    math_func.py:806-838). Returns f32 counts [nbins].

    Implemented as a one-hot reduction, not bincount: TPU lowers
    bincount to serialized scatter-adds (measured ~6% of the CIFAR
    train step), while the one-hot sum is an MXU-friendly dense
    reduction (~1% — measured 429.4 vs 455.8 steps/s with histograms
    on, 461.2 off)."""
    idx = jnp.clip(
        ((x.reshape(-1) - lo) * (nbins / (hi - lo))).astype(jnp.int32),
        0, nbins - 1)
    return jnp.sum(jax.nn.one_hot(idx, nbins, dtype=jnp.float32), axis=0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LossState:
    """Persistent (non-trainable) loss state, updated once per train step.

    Replaces TF variables in variable_scope 'coin' / 'ins_noise'
    (math_func.py:2074-2079, 2476-2478).
    """

    loss_average: Array  # moving average of the generator mmd
    mix_prob: Array      # probability of mixing real/fake groups
    ins_sigma: Array     # instance-noise sigma

    @staticmethod
    def init() -> "LossState":
        z = jnp.zeros([], jnp.float32)
        return LossState(loss_average=z, mix_prob=z, ins_sigma=z)


def _get_mix_coin(
    rng: Array,
    loss: Array,
    loss_threshold: float,
    batch_size: int,
    state: LossState,
    loss_average_update: float = 0.01,
    mix_prob_update: float = 0.01,
) -> Tuple[Array, LossState]:
    """Sample mix indices; update moving averages (math_func.py:2061-2085).

    Reads use the pre-update state values (TF1 read-before-assign
    semantics); returns the updated state.
    """
    uni = jax.random.uniform(rng, [batch_size], minval=0.0, maxval=1.0)
    mix_indices = uni > state.mix_prob  # True = keep original group
    new_avg = (1.0 - loss_average_update) * state.loss_average + loss_average_update * loss
    new_prob = jnp.clip(
        state.mix_prob + mix_prob_update * (state.loss_average - loss_threshold), 0.0, 0.5
    )
    new_state = dataclasses.replace(state, loss_average=new_avg, mix_prob=new_prob)
    return mix_indices, new_state


@dataclasses.dataclass
class GANLoss:
    """Hyper-parameter bundle + dispatcher (math_func.py:2088-2116).

    Construct once; call :meth:`apply` inside the (jitted) train step.
    """

    # Gaussian sigma mixture (math_func.py:2108)
    sigma: Sequence[float] = (1.0, float(np.sqrt(2.0)), 2.0, float(np.sqrt(8.0)), 4.0)
    # t-kernel alphas / beta (math_func.py:2110-2111)
    alpha: Sequence[float] = (0.2, 0.5, 1.0, 2.0, 5.0)
    beta: float = 2.0
    # rand_g omega sampling range (math_func.py:2112)
    omega_range: Tuple[float, float] = (0.05, 0.85)
    ref_normal: float = 1.0
    # repulsive weights for e_kxy and -e_kyy; w[0]-w[1] == 1
    # (math_func.py:2115); k_yy is the REAL data kernel.
    repulsive_weights: Sequence[float] = (0.0, -1.0)
    # threshold for the mix-coin losses
    mix_threshold: float = 0.2
    # use the fused Pallas kernel for rep/rmb on TPU
    use_pallas: bool = False
    # include fixed-bin distance/score histograms under hist/* aux keys
    # (math_func.py:806-838 distance summaries); scalar kernel means are
    # always on — they reuse values the loss computes anyway
    summary_histograms: bool = False

    # ----- simple adversarial losses -------------------------------------
    def _logistic(self, s_gen, s_x):
        loss_dis = jnp.mean(jax.nn.softplus(s_gen) + jax.nn.softplus(-s_x))
        loss_gen = jnp.mean(jax.nn.softplus(-s_gen))
        return loss_gen, loss_dis

    def _hinge(self, s_gen, s_x):
        loss_dis = jnp.mean(jax.nn.relu(1.0 + s_gen)) + jnp.mean(jax.nn.relu(1.0 - s_x))
        loss_gen = jnp.mean(-s_gen)
        return loss_gen, loss_dis

    def _wasserstein(self, s_gen, s_x, dis_penalty):
        assert dis_penalty is not None, "Discriminator penalty must be provided for wasserstein GAN"
        loss_gen = jnp.mean(s_x) - jnp.mean(s_gen)
        loss_dis = -loss_gen + dis_penalty
        return loss_gen, loss_dis

    # ----- mmd losses -----------------------------------------------------
    def _stash_dist_hist(self, aux, d_gg, d_gd, d_dd):
        # x = generated, y = real in the reference's kernel naming
        if aux is not None and self.summary_histograms:
            aux["hist/d_xx"] = fixed_bin_histogram(d_gg, *HIST_RANGES["hist/d_xx"])
            aux["hist/d_xy"] = fixed_bin_histogram(d_gd, *HIST_RANGES["hist/d_xy"])
            aux["hist/d_yy"] = fixed_bin_histogram(d_dd, *HIST_RANGES["hist/d_yy"])

    def _dists(self, s_gen, s_x, aux=None):
        d_gg, d_gd, d_dd = get_squared_dist(s_gen, s_x, z_score=False, mode="xxxyyy")
        self._stash_dist_hist(aux, d_gg, d_gd, d_dd)
        return d_gg, d_gd, d_dd

    def _mmd_g(self, s_gen, s_x, batch_size, dis_penalty, aux):
        d_gg, d_gd, d_dd = self._dists(s_gen, s_x, aux)
        loss_gen, k_aux = mixture_mmd_g(
            d_gg, d_gd, d_dd, batch_size, sigma=self.sigma, with_aux=True)
        aux.update(k_aux)
        loss_dis = -loss_gen
        if dis_penalty is not None:
            loss_dis = loss_dis + dis_penalty
        return loss_gen, loss_dis

    def _mmd_g_bound(self, s_gen, s_x, batch_size, dis_penalty, aux):
        # 'mgb' (math_func.py:2175-2193)
        d_gg, d_gd, d_dd = self._dists(s_gen, s_x, aux)
        loss_gen, k_aux = mmd_g(
            d_gg, d_gd, d_dd, batch_size, sigma=1.0, with_aux=True)
        mmd_b, b_aux = mmd_g(
            d_gg, d_gd, d_dd, batch_size, sigma=1.0, upper_bound=4,
            lower_bound=0.25, with_aux=True)
        aux.update(k_aux)
        aux.update({f"bounded/{k}": v for k, v in b_aux.items()})
        loss_dis = -mmd_b
        if dis_penalty is not None:
            loss_dis = loss_dis + dis_penalty
        return loss_gen, loss_dis

    def _mmd_t(self, s_gen, s_x, batch_size, dis_penalty, aux):
        d_gg, d_gd, d_dd = self._dists(s_gen, s_x, aux)
        loss_gen, k_aux = mixture_mmd_t(
            d_gg, d_gd, d_dd, batch_size, alpha=self.alpha, beta=self.beta,
            with_aux=True)
        aux.update(k_aux)
        loss_dis = -loss_gen
        if dis_penalty is not None:
            loss_dis = loss_dis + dis_penalty
        return loss_gen, loss_dis

    def _repulsive(self, s_gen, s_x, batch_size, dis_penalty, dis_scale, aux):
        """'rep' — the paper's repulsive loss (math_func.py:2505-2528)."""
        if self.use_pallas:
            # the fused kernel keeps only the loss pair on-chip; kernel
            # means are not surfaced on this (default-off) path
            from mmdgan_tpu.ops.pallas_mmd import repulsive_mmd_g_pallas
            loss_gen, loss_dis = repulsive_mmd_g_pallas(
                s_gen, s_x, sigma=1.0, repulsive_weights=tuple(self.repulsive_weights)
            )
        else:
            d_gg, d_gd, d_dd = self._dists(s_gen, s_x, aux)
            loss_gen, loss_dis, k_aux = mmd_g(
                d_gg, d_gd, d_dd, batch_size, sigma=1.0,
                custom_weights=self.repulsive_weights, with_aux=True,
            )
            aux.update(k_aux)
        if dis_penalty is not None:
            loss_dis = loss_dis + dis_penalty
        if dis_scale is not None:
            loss_dis = (loss_dis - 1.0) * dis_scale
        return loss_gen, loss_dis

    def _repulsive_bounded(self, s_gen, s_x, batch_size, dis_penalty, dis_scale, aux):
        """'rmb' — repulsive + bounded rbf kernel (math_func.py:2530-2550)."""
        if self.use_pallas:
            from mmdgan_tpu.ops.pallas_mmd import repulsive_mmd_g_bounded_pallas
            loss_gen, loss_dis = repulsive_mmd_g_bounded_pallas(
                s_gen, s_x, sigma=1.0, lower_bound=0.25, upper_bound=4.0,
                repulsive_weights=tuple(self.repulsive_weights),
            )
        else:
            d_gg, d_gd, d_dd = self._dists(s_gen, s_x, aux)
            loss_gen, loss_dis, k_aux = mmd_g_bounded(
                d_gg, d_gd, d_dd, batch_size, sigma=1.0, lower_bound=0.25, upper_bound=4.0,
                custom_weights=self.repulsive_weights, with_aux=True,
            )
            aux.update(k_aux)
        if dis_penalty is not None:
            loss_dis = loss_dis + dis_penalty
        if dis_scale is not None:
            loss_dis = loss_dis * dis_scale
        return loss_gen, loss_dis

    # ----- mix-coin losses ------------------------------------------------
    def _mmd_g_mix(self, s_gen, s_x, batch_size, rng, state, single_sigma: bool, aux):
        # math_func.py:2195-2261
        pair_dist = get_squared_dist(jnp.concatenate([s_gen, s_x], axis=0))
        d_gg, d_gd, d_dd = slice_pairwise_distance(pair_dist, batch_size=batch_size)
        self._stash_dist_hist(aux, d_gg, d_gd, d_dd)
        if single_sigma:
            loss_gen, k_aux = mmd_g(
                d_gg, d_gd, d_dd, batch_size, sigma=1.0, with_aux=True)
        else:
            loss_gen, k_aux = mixture_mmd_g(
                d_gg, d_gd, d_dd, batch_size, sigma=self.sigma, with_aux=True)
        aux.update(k_aux)
        mix_indices, state = _get_mix_coin(rng, loss_gen, self.mix_threshold, batch_size, state)
        d_gg_m, d_gd_m, d_dd_m = slice_pairwise_distance(pair_dist, indices=mix_indices)
        if single_sigma:
            loss_mix, m_aux = mmd_g(
                d_gg_m, d_gd_m, d_dd_m, batch_size, sigma=1.0, with_aux=True)
        else:
            loss_mix, m_aux = mixture_mmd_g(
                d_gg_m, d_gd_m, d_dd_m, batch_size, sigma=self.sigma, with_aux=True)
        aux.update({f"mix/{k}": v for k, v in m_aux.items()})
        return loss_gen, -loss_mix, state

    def _sample_omega(self, rng):
        # a scalar omega_range means a fixed omega (math_func.py:2286-2287)
        if not isinstance(self.omega_range, (list, tuple)):
            return jnp.asarray(self.omega_range, jnp.float32)
        lo, hi = self.omega_range
        return jax.random.uniform(rng, [], minval=lo, maxval=hi)

    def _rand_g(self, s_gen, s_x, batch_size, d, rng, aux):
        # math_func.py:2277-2307
        d_gg, d_gd, d_dd = self._dists(s_gen, s_x, aux)
        omega = self._sample_omega(rng)
        loss_gr, gr_aux = rand_mmd_g_xy(
            d_gg, d_gd, d_dd, batch_size, omega=omega, max_iter=3, with_aux=True)
        loss_rn, rn_aux = rand_mmd_g_xn(
            s_x, self.ref_normal, batch_size, d, dist_xx=d_dd, omega=omega,
            max_iter=3, with_aux=True)
        aux["omega"] = omega
        aux.update(gr_aux)
        aux.update({f"rn/{k}": v for k, v in rn_aux.items()})
        return loss_gr, loss_rn - loss_gr

    def _rand_g_bounded(self, s_gen, s_x, batch_size, rng, aux):
        # 'rgb' (math_func.py:2309-2339)
        d_gg, d_gd, d_dd = self._dists(s_gen, s_x, aux)
        omega = self._sample_omega(rng)
        loss_gr, loss_gr_b, k_aux = rand_mmd_g_xy_bounded(
            d_gg, d_gd, d_dd, batch_size, omega=omega, max_iter=3, with_aux=True
        )
        aux["omega"] = omega
        aux.update(k_aux)
        return loss_gr, -loss_gr_b

    def _rand_g_mix(self, s_gen, s_x, batch_size, d, rng, state, symmetric: bool, aux):
        # math_func.py:2341-2432
        rng_omega, rng_coin = jax.random.split(rng)
        pair_dist = get_squared_dist(jnp.concatenate([s_gen, s_x], axis=0))
        d_gg, d_gd, d_dd = slice_pairwise_distance(pair_dist, batch_size=batch_size)
        self._stash_dist_hist(aux, d_gg, d_gd, d_dd)
        omega = self._sample_omega(rng_omega)
        loss_gr, gr_aux = rand_mmd_g_xy(
            d_gg, d_gd, d_dd, batch_size, omega=omega, max_iter=3, with_aux=True)
        loss_gn, gn_aux = rand_mmd_g_xn(
            s_gen, self.ref_normal, batch_size, d, dist_xx=d_gg, omega=omega,
            max_iter=3, with_aux=True)
        loss_rn, rn_aux = rand_mmd_g_xn(
            s_x, self.ref_normal, batch_size, d, dist_xx=d_dd, omega=omega,
            max_iter=3, with_aux=True)
        mix_indices, state = _get_mix_coin(rng_coin, loss_gr, self.mix_threshold, batch_size, state)
        d_gg_m, d_gd_m, d_dd_m = slice_pairwise_distance(pair_dist, indices=mix_indices)
        loss_gr_mix, mix_aux = rand_mmd_g_xy(
            d_gg_m, d_gd_m, d_dd_m, batch_size, omega=omega, max_iter=3, with_aux=True)
        aux["omega"] = omega
        aux.update(gr_aux)
        aux.update({f"gn/{k}": v for k, v in gn_aux.items()})
        aux.update({f"rn/{k}": v for k, v in rn_aux.items()})
        aux.update({f"mix/{k}": v for k, v in mix_aux.items()})
        if symmetric:  # 'sym_rg_mix' (math_func.py:2417-2419)
            return loss_gr + loss_gn, loss_rn - loss_gr_mix - loss_gn, state
        return loss_gr, loss_rn - loss_gr_mix, state

    def _sym_rand_g(self, s_gen, s_x, batch_size, d, rng, aux):
        # 'sym_rg' (math_func.py:2434-2458)
        pair_dist = get_squared_dist(jnp.concatenate([s_gen, s_x], axis=0))
        d_gg, d_gd, d_dd = slice_pairwise_distance(pair_dist, batch_size=batch_size)
        self._stash_dist_hist(aux, d_gg, d_gd, d_dd)
        omega = self._sample_omega(rng)
        loss_gr, gr_aux = rand_mmd_g_xy(
            d_gg, d_gd, d_dd, batch_size, omega=omega, max_iter=3, with_aux=True)
        loss_gn, gn_aux = rand_mmd_g_xn(
            s_gen, self.ref_normal, batch_size, d, y_mu=-0.5, dist_xx=d_gg,
            omega=omega, max_iter=3, with_aux=True)
        loss_rn, rn_aux = rand_mmd_g_xn(
            s_x, self.ref_normal, batch_size, d, y_mu=0.5, dist_xx=d_dd,
            omega=omega, max_iter=3, with_aux=True)
        aux["omega"] = omega
        aux.update(gr_aux)
        aux.update({f"gn/{k}": v for k, v in gn_aux.items()})
        aux.update({f"rn/{k}": v for k, v in rn_aux.items()})
        return loss_gr, 0.5 * (loss_rn + loss_gn) - loss_gr

    def _instance_noise(self, s_gen, s_x, batch_size, d, rng, state, aux):
        # math_func.py:2470-2498: add N(0, log(1+sigma)) noise to scores,
        # use rand_g, then update sigma by the moving mmd average.
        rng_g, rng_x, rng_loss = jax.random.split(rng, 3)
        stddev = jnp.log(state.ins_sigma + 1.0)
        s_gen = s_gen + stddev * jax.random.normal(rng_g, s_gen.shape)
        s_x = s_x + stddev * jax.random.normal(rng_x, s_x.shape)
        loss_gen, loss_dis = self._rand_g(s_gen, s_x, batch_size, d, rng_loss, aux)
        aux["ins_stddev"] = stddev
        new_avg = 0.99 * state.loss_average + 0.01 * loss_gen
        new_sigma = jnp.clip(
            state.ins_sigma + 0.001 * (state.loss_average - self.mix_threshold), 0.0, 1.7183
        )
        state = dataclasses.replace(state, loss_average=new_avg, ins_sigma=new_sigma)
        return loss_gen, loss_dis, state

    # ----- dispatcher -----------------------------------------------------
    def apply(
        self,
        score_gen: Array,
        score_data: Array,
        loss_type: str = "logistic",
        batch_size: Optional[int] = None,
        d: Optional[int] = None,
        dis_penalty: Optional[Array] = None,
        dis_scale: Optional[Array] = None,
        rng: Optional[Array] = None,
        state: Optional[LossState] = None,
    ) -> Tuple[Array, Array, LossState, Dict[str, Array]]:
        """Dispatch to a loss (math_func.py:2556-2655).

        Returns (loss_gen, loss_dis, new_state, aux). ``aux`` carries the
        per-loss diagnostics the reference wrote as TB summaries: kernel
        means (e_kxx/e_kxy/e_kyy and bounded/per-sigma variants,
        math_func.py:1329-1333), Newton-``beta``/``omega`` for rand_*
        losses, coin/instance-noise state scalars, penalty magnitudes,
        and ``hist/*`` fixed-bin histograms when ``summary_histograms``.
        """
        if state is None:
            state = LossState.init()
        if rng is None:
            rng = jax.random.PRNGKey(0)

        mmd_like = {
            "fixed_g", "mmd_g", "fixed_t", "mmd_t", "mmd_g_mix", "fixed_g_mix",
            "rand_g", "rand_g_mix", "sym_rg_mix", "instance_noise", "ins_noise",
            "sym_rg", "rgb", "rep", "rep_gp", "rmb", "rmb_gp", "mgb", "sgm",
            "rep_mmd_g", "rep_b", "rep_mmd_b", "rep_ds", "rmb_ds", "sym_rand_g",
            "cramer",
        }
        if loss_type in mmd_like:
            assert batch_size is not None, "GANLoss: batch_size must be provided"
            assert score_gen.shape[0] == score_data.shape[0] == batch_size, (
                f"GANLoss: score shapes {score_gen.shape[0]}/{score_data.shape[0]} "
                f"do not match batch_size {batch_size}"
            )
        if loss_type in {"rand_g", "rand_g_mix", "sym_rg_mix", "sym_rg", "sym_rand_g",
                         "instance_noise", "ins_noise"}:
            assert d is not None, "GANLoss: d must be provided"
        if loss_type in {"rep_gp", "rmb_gp", "wasserstein"}:
            assert dis_penalty is not None, "Discriminator penalty must be provided."
        if loss_type in {"rep_ds", "rmb_ds"}:
            assert dis_scale is not None, "Discriminator loss scale must be provided."

        aux: Dict[str, Array] = {}
        stateful = False
        if loss_type in {"logistic", ""}:
            lg, ld = self._logistic(score_gen, score_data)
        elif loss_type == "hinge":
            lg, ld = self._hinge(score_gen, score_data)
        elif loss_type == "wasserstein":
            lg, ld = self._wasserstein(score_gen, score_data, dis_penalty)
        elif loss_type in {"fixed_g", "mmd_g"}:
            lg, ld = self._mmd_g(score_gen, score_data, batch_size, dis_penalty, aux)
        elif loss_type == "mgb":
            lg, ld = self._mmd_g_bound(score_gen, score_data, batch_size, dis_penalty, aux)
        elif loss_type in {"fixed_t", "mmd_t"}:
            lg, ld = self._mmd_t(score_gen, score_data, batch_size, dis_penalty, aux)
        elif loss_type == "cramer":
            d_gg, d_gd, d_dd = self._dists(score_gen, score_data, aux)
            lg, k_aux = cramer(d_gg, d_gd, d_dd, batch_size, with_aux=True)
            aux.update(k_aux)
            ld = -lg if dis_penalty is None else -lg + dis_penalty
        elif loss_type in {"mmd_g_mix", "fixed_g_mix"}:
            lg, ld, state = self._mmd_g_mix(
                score_gen, score_data, batch_size, rng, state, single_sigma=False,
                aux=aux)
            stateful = True
        elif loss_type == "sgm":
            lg, ld, state = self._mmd_g_mix(
                score_gen, score_data, batch_size, rng, state, single_sigma=True,
                aux=aux)
            stateful = True
        elif loss_type == "rand_g":
            lg, ld = self._rand_g(score_gen, score_data, batch_size, d, rng, aux)
        elif loss_type == "rgb":
            lg, ld = self._rand_g_bounded(score_gen, score_data, batch_size, rng, aux)
        elif loss_type == "rand_g_mix":
            lg, ld, state = self._rand_g_mix(
                score_gen, score_data, batch_size, d, rng, state, symmetric=False,
                aux=aux)
            stateful = True
        elif loss_type == "sym_rg_mix":
            lg, ld, state = self._rand_g_mix(
                score_gen, score_data, batch_size, d, rng, state, symmetric=True,
                aux=aux)
            stateful = True
        elif loss_type in {"sym_rg", "sym_rand_g"}:
            lg, ld = self._sym_rand_g(score_gen, score_data, batch_size, d, rng, aux)
        elif loss_type in {"instance_noise", "ins_noise"}:
            lg, ld, state = self._instance_noise(
                score_gen, score_data, batch_size, d, rng, state, aux)
            stateful = True
        elif loss_type in {"rep", "rep_mmd_g", "rep_gp", "rep_ds"}:
            lg, ld = self._repulsive(
                score_gen, score_data, batch_size, dis_penalty, dis_scale, aux)
        elif loss_type in {"rmb", "rep_b", "rep_mmd_b", "rmb_gp", "rmb_ds"}:
            lg, ld = self._repulsive_bounded(
                score_gen, score_data, batch_size, dis_penalty, dis_scale, aux)
        elif loss_type == "test":
            lg, ld = jnp.zeros([]), jnp.zeros([])
        else:
            raise NotImplementedError(f"loss {loss_type} not implemented.")

        if stateful:
            # surface the evolving loss state (the reference's 'coin' /
            # 'ins_noise' variables, math_func.py:2074-2079, 2476-2478)
            aux["state/loss_average"] = state.loss_average
            aux["state/mix_prob"] = state.mix_prob
            aux["state/ins_sigma"] = state.ins_sigma
        if dis_penalty is not None:
            aux["dis_penalty"] = jnp.asarray(dis_penalty)
        if dis_scale is not None:
            aux["dis_scale"] = jnp.asarray(dis_scale)
        if self.summary_histograms:
            aux["hist/score_gen"] = fixed_bin_histogram(
                score_gen, *HIST_RANGES["hist/score_gen"])
            aux["hist/score_x"] = fixed_bin_histogram(
                score_data, *HIST_RANGES["hist/score_x"])
        return lg, ld, state, aux

    def __call__(self, *args, **kwargs):
        return self.apply(*args, **kwargs)


def gan_loss(score_gen, score_data, loss_type="logistic", **kwargs):
    """Convenience wrapper constructing a default :class:`GANLoss`.

    Hyper-parameter kwargs (sigma, alpha, beta, omega, ref_normal,
    rep_weights, mix_threshold) configure the bundle; the rest are passed
    to :meth:`GANLoss.apply`. Returns ``(loss_gen, loss_dis, new_state,
    aux)`` like :meth:`GANLoss.apply`.
    """
    hp = {}
    if "sigma" in kwargs:
        hp["sigma"] = kwargs.pop("sigma")
    if "alpha" in kwargs:
        hp["alpha"] = kwargs.pop("alpha")
    if "beta" in kwargs:
        hp["beta"] = kwargs.pop("beta")
    if "omega" in kwargs:
        hp["omega_range"] = kwargs.pop("omega")
    if "ref_normal" in kwargs:
        hp["ref_normal"] = kwargs.pop("ref_normal")
    if "rep_weights" in kwargs:
        hp["repulsive_weights"] = kwargs.pop("rep_weights")
    if "mix_threshold" in kwargs:
        hp["mix_threshold"] = kwargs.pop("mix_threshold")
    if "use_pallas" in kwargs:
        hp["use_pallas"] = kwargs.pop("use_pallas")
    if "summary_histograms" in kwargs:
        hp["summary_histograms"] = kwargs.pop("summary_histograms")
    return GANLoss(**hp).apply(score_gen, score_data, loss_type, **kwargs)
