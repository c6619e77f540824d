"""SNGan: generator + discriminator + MMD losses, wired for one fused
train step.

Functional JAX rebuild of ``DeepLearning/my_sngan.py:30-690``. Differences
from the reference (all deliberate, TPU-first):

- Batch-size independent graphs (the reference hard-codes batch 64 into
  ``init_net``, my_sngan.py:96/:106 — a documented quirk we do not copy).
- The whole training computation (z sampling, G fwd, one D pass on
  concat(real, fake), loss, both gradients) is one pure function suitable
  for a single jit/pjit region; gradient computation shares ONE forward
  pass between the two losses via ``jax.vjp`` (the reference builds one
  graph and runs two ``compute_gradients`` on it, my_sngan.py:301-305).
- Gradient penalties (wgan-gp, MMD witness gp, scaled-MMD Jacobian scale;
  my_sngan.py:152-240) are actually wired into the loss when a ``*_gp`` /
  ``*_ds`` loss type is selected (the reference defines but never invokes
  them from ``__gpu_task__``).
- NHWC image layout end-to-end.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmdgan_tpu.models.network import Net, Routine
from mmdgan_tpu.ops.distance import get_squared_dist
from mmdgan_tpu.ops.kernels import witness_g, witness_mix_g, witness_mix_t
from mmdgan_tpu.ops.losses import GANLoss, LossState


def decode_image_batch(data_batch: Dict) -> Dict:
    """Device-side image decode: uint8 batches (from
    ``ReadTFRecords(device_decode=True)``) become f32 in [-1, 1] on
    device. The host->device link then carries 4x fewer bytes. f32
    batches pass through untouched — numerics are identical to host
    decoding (same x/127.5-1 in f32)."""
    x = data_batch.get("x")
    if x is not None and x.dtype == jnp.uint8:
        data_batch = dict(data_batch)
        data_batch["x"] = x.astype(jnp.float32) / 127.5 - 1.0
    return data_batch

Array = jnp.ndarray


def jacobian_squared_frobenius_norm(fwd, x):
    """E_i ||d s(x)_i / d x||_F^2 per sample via a vjp probe.

    Rebuild of ``jacobian_squared_frobenius_norm`` (math_func.py:2733-2779)
    computed exactly: sum over output dims of squared input-gradients.
    """
    y, vjp = jax.vjp(fwd, x)
    d = y.shape[-1]
    eye = jnp.eye(d, dtype=y.dtype)

    def row(e):
        ct = jnp.broadcast_to(e, y.shape)
        (gx,) = vjp(ct)
        return jnp.sum(jnp.square(gx.reshape(gx.shape[0], -1)), axis=1)

    # sum_j ||d y_j / d x||^2 for each sample
    return jnp.sum(jax.vmap(row)(eye), axis=0)


class SNGan:
    def __init__(
        self,
        architecture: dict,
        num_class: int = 0,
        loss_type: str = "rep",
        optimizer: str = "adam",
        do_summary: bool = True,
        rep_weights: Sequence[float] = (0.0, -1.0),
        penalty_weight: float = 0.1,
        gp_weight: float = 10.0,
        init_mode: str = "default",
        sn_mode: str = "pico",
        compute_dtype=jnp.bfloat16,
        use_pallas: bool = False,
        sigma: Optional[Sequence[float]] = None,
        summary_histograms: bool = False,
        **kwargs,
    ):
        """:param architecture: dict with 'input' [(C, H, W)], 'code'
        [(code_size, act)], 'generator' and 'discriminator' layer lists —
        the exact reference format (my_test_cifar.py:12-38).

        Observability (docs/observability.md): the loss-internals
        scalars (kernel means, Newton beta, coin state, penalty
        magnitudes) are ALWAYS in the step metrics — they reuse values
        the loss computes, measured free. ``do_summary`` (default on)
        additionally gates the per-net gradient norms (~free).
        ``summary_histograms`` opts into hist/* fixed-bin distance/score
        histograms from inside the step — measured ~1% step cost (an
        MXU one-hot reduction), kept opt-in to mirror the reference,
        where histogram summary ops only executed on query-step fetches
        (graph_func.py:860-866)."""
        self.architecture = architecture
        self.loss_type = loss_type
        self.optimizer = optimizer
        self.num_class = num_class
        self.do_summary = do_summary
        # input spec is channels-first in the reference dicts
        self.channels = architecture["input"][0][0]
        self.height = architecture["input"][0][1]
        self.width = architecture["input"][0][2]
        self.input_size = int(np.prod(architecture["input"][0]))
        self.code_size = architecture["code"][0][0]
        self.score_size = architecture["discriminator"][-1]["out"]
        self.rep_weights = list(rep_weights)
        self.penalty_weight = penalty_weight
        self.gp_weight = gp_weight
        self.init_mode = init_mode
        self.sn_mode = sn_mode
        self.compute_dtype = compute_dtype
        self.sample_same_class = False
        self.loss_hp = GANLoss(
            repulsive_weights=self.rep_weights, use_pallas=use_pallas,
            summary_histograms=summary_histograms,
            **({"sigma": tuple(sigma)} if sigma is not None else {}),
        )
        self.Gen: Optional[Routine] = None
        self.Dis: Optional[Routine] = None
        self.init_net()

    # ------------------------------------------------------------------
    def init_net(self):
        """Build Gen/Dis routines (my_sngan.py:85-108), batch-agnostic."""
        g_net = Net(
            self.architecture["generator"], net_name="gen",
            num_class=self.num_class, init_mode=self.init_mode,
            sn_mode=self.sn_mode, compute_dtype=self.compute_dtype,
        )
        self.Gen = Routine(g_net)
        self.Gen.add_input_layers([self.code_size], [0])
        self.Gen.seq_links(list(range(g_net.num_layers)))
        self.Gen.add_output_layers([g_net.num_layers - 1])

        d_net = Net(
            self.architecture["discriminator"], net_name="dis",
            num_class=self.num_class, init_mode=self.init_mode,
            sn_mode=self.sn_mode, compute_dtype=self.compute_dtype,
        )
        self.Dis = Routine(d_net)
        self.Dis.add_input_layers(
            [self.channels, self.height, self.width], [0]
        )
        self.Dis.seq_links(list(range(d_net.num_layers)))
        self.Dis.add_output_layers([d_net.num_layers - 1])

        # sanity: generator must emit the data shape (NHWC)
        g_out = self.Gen.output_shape
        expect = (self.height, self.width, self.channels)
        assert tuple(g_out) == expect, (
            f"generator output {g_out} does not match data shape {expect}"
        )

    # ------------------------------------------------------------------
    def init(self, key: Array) -> Tuple[Dict, Dict, LossState]:
        """Returns (params, net_state, loss_state); params has 'gen'/'dis'
        sub-trees (the reference's var collections, my_sngan.py:301-305)."""
        kg, kd = jax.random.split(key)
        pg, sg = self.Gen.init(kg)
        pd, sd = self.Dis.init(kd)
        params = {"gen": pg, "dis": pd}
        state = {"gen": sg, "dis": sd}
        return params, state, LossState.init()

    # ------------------------------------------------------------------
    def sample_codes(
        self,
        rng: Array,
        batch_size: int,
        code_x: Optional[Array] = None,
        code_y: Optional[Array] = None,
    ) -> Dict[str, Optional[Array]]:
        """z ~ N(0, 1), labels ~ U{0..num_class-1} (my_sngan.py:111-149)."""
        rng_x, rng_y = jax.random.split(rng)
        if code_x is None:
            code_x = jax.random.normal(rng_x, (batch_size, self.code_size))
        else:
            code_x = jnp.asarray(code_x, jnp.float32)
            assert code_x.shape[0] == batch_size
        if self.num_class < 2:
            return {"x": code_x, "y": None}
        if code_y is None:
            code_y = jax.random.randint(rng_y, (batch_size, 1), 0, self.num_class)
        elif isinstance(code_y, int):
            code_y = jnp.full((batch_size, 1), code_y, jnp.int32)
        else:
            code_y = jnp.asarray(code_y)
            if code_y.ndim == 1:
                code_y = code_y[:, None]
        return {"x": code_x, "y": code_y}

    # ------------------------------------------------------------------
    @staticmethod
    def concat_two_batches(batch1, batch2):
        """my_sngan.py:243-256."""
        out = {"x": jnp.concatenate([batch1["x"], batch2["x"]], axis=0)}
        if batch1.get("y") is not None and batch2.get("y") is not None:
            out["y"] = jnp.concatenate([batch1["y"], batch2["y"]], axis=0)
        else:
            out["y"] = None
        return out

    # ------------------------------------------------------------------
    def generate(
        self,
        params: Dict,
        state: Dict,
        rng: Optional[Array] = None,
        batch_size: Optional[int] = None,
        code_batch: Optional[Dict] = None,
        clip: bool = True,
        labels=None,
    ) -> Array:
        """Eval-mode generation (my_sngan.py:324-329 + clip at :628).

        ``labels``: int scalar or [N]/[N, 1] int array — the class(es) to
        condition on (conditional models). Ignored if ``code_batch`` is
        given (put the labels in ``code_batch['y']`` instead).
        """
        if code_batch is None:
            if labels is not None and batch_size is None:
                y = jnp.asarray(labels)
                if y.ndim >= 1:
                    batch_size = y.shape[0]
            code_batch = self.sample_codes(rng, batch_size, code_y=labels)
        gen_batch, _ = self.Gen.apply(
            params["gen"], state["gen"], code_batch, train=False
        )
        x = gen_batch["x"]
        return jnp.clip(x, -1.0, 1.0) if clip else x

    def discriminate(self, params, state, batch, train: bool = False,
                     labels=None):
        """Score a batch. ``batch`` is either a {'x', 'y'} dict or a raw
        image array (pass class labels via ``labels`` in that case)."""
        if not isinstance(batch, dict):
            y = None
            if labels is not None:
                y = jnp.asarray(labels)
                if y.ndim == 1:
                    y = y[:, None]
            batch = {"x": batch, "y": y}
        batch = decode_image_batch({**batch, "x": jnp.asarray(batch["x"])})
        out, _ = self.Dis.apply(params["dis"], state["dis"], batch, train=train)
        return out["x"]

    # ------------------------------------------------------------------
    # gradient penalties (my_sngan.py:152-240)
    # ------------------------------------------------------------------
    def _dis_fwd(self, params_d, state, batch):
        out, _ = self.Dis.apply(params_d, state["dis"], batch, train=False)
        return out["x"]

    def gradient_penalty(self, params_d, state, rng, x, x_gen, labels=None,
                         uni=None):
        """WGAN-GP penalty E (||d D(x_hat)/d x_hat|| - 1)^2 (my_sngan.py:152-175).

        ``uni``: optional fixed [N,1,1,1] interpolation weights (for
        deterministic cross-validation); sampled from ``rng`` otherwise."""
        batch_size = x.shape[0]
        if uni is None:
            uni = jax.random.uniform(rng, (batch_size, 1, 1, 1))
        x_hat = x * uni + x_gen * (1.0 - uni)

        def score_sum(xh):
            s = self._dis_fwd(params_d, state, {"x": xh, "y": labels})
            return jnp.sum(s)

        g = jax.grad(score_sum)(x_hat).reshape(batch_size, -1)
        # sqrt(sum+eps), not linalg.norm: d||g||/dg = g/||g|| is NaN at
        # g=0 (early training regularly hits zero witness gradients and
        # the whole second-order step NaNs out). eps=1e-12 is below
        # crossval tolerance.
        norm = jnp.sqrt(jnp.sum(jnp.square(g), axis=1) + 1e-12)
        return jnp.mean(jnp.square(norm - 1.0))

    def mmd_gradient_penalty(
        self, params_d, state, rng, x, x_gen, s_x, s_gen, mode="rep_gp",
        labels=None, uni=None
    ):
        """MMD witness gradient penalty (my_sngan.py:178-223). ``uni``:
        optional fixed interpolation weights (crossval determinism)."""
        batch_size = x.shape[0]
        if uni is None:
            uni = jax.random.uniform(rng, (batch_size, 1, 1, 1))
        x_hat = x * uni + x_gen * (1.0 - uni)

        def witness_sum(xh):
            s_hat = self._dis_fwd(params_d, state, {"x": xh, "y": labels})
            dist_zx = get_squared_dist(s_hat, s_x, mode="xy")
            dist_zy = get_squared_dist(s_hat, s_gen, mode="xy")
            if mode == "fixed_g_gp":
                wit = witness_mix_g(
                    dist_zx, dist_zy,
                    sigma=[1.0, np.sqrt(2.0), 2.0, np.sqrt(8.0), 4.0])
            elif mode == "fixed_t_gp":
                wit = witness_mix_t(
                    dist_zx, dist_zy, alpha=[0.25, 0.5, 0.9, 2.0, 25.0], beta=2.0)
            elif mode in ("rep_gp", "rmb_gp"):
                wit = witness_g(dist_zx, dist_zy, sigma=1.0)
            else:
                raise NotImplementedError(f"gradient penalty: {mode} not implemented")
            return jnp.sum(wit)

        g = jax.grad(witness_sum)(x_hat).reshape(batch_size, -1)
        # sqrt(sum+eps), not linalg.norm: d||g||/dg = g/||g|| is NaN at
        # g=0 (early training regularly hits zero witness gradients and
        # the whole second-order step NaNs out). eps=1e-12 is below
        # crossval tolerance.
        norm = jnp.sqrt(jnp.sum(jnp.square(g), axis=1) + 1e-12)
        return jnp.mean(jnp.square(norm - 1.0))

    def mmd_gradient_scale(self, params_d, state, x, labels=None):
        """Scaled-MMD discriminator scale from the Jacobian Frobenius norm
        (my_sngan.py:226-240)."""
        fwd = lambda xx: self._dis_fwd(params_d, state, {"x": xx, "y": labels})
        jaco = jacobian_squared_frobenius_norm(fwd, x)
        return 1.0 / (self.penalty_weight * jnp.mean(jaco) + 1.0)

    # ------------------------------------------------------------------
    def compute_losses(
        self,
        params: Dict,
        state: Dict,
        loss_state: LossState,
        rng: Array,
        data_batch: Dict,
        train: bool = True,
        code_batch: Optional[Dict] = None,
    ):
        """The training computation (my_sngan.py:259-323): sample codes,
        G fwd, ONE D pass on concat(real, fake), split scores, loss.

        ``code_batch`` overrides the z sampling (the reference
        __gpu_task__'s code_batch parameter, my_sngan.py:261).
        Returns (loss_gen, loss_dis, new_state, new_loss_state, aux).
        """
        data_batch = decode_image_batch(data_batch)
        rng_code, rng_loss, rng_gp = jax.random.split(rng, 3)
        gen_out, gen_state, code_batch = self.gen_stage(
            params["gen"], state, rng_code, data_batch,
            train=train, code_batch=code_batch)
        loss_gen, loss_dis, dis_state, new_loss_state, aux = self.dis_stage(
            params["dis"], gen_out["x"], gen_out.get("y"), state, loss_state,
            rng_loss, rng_gp, data_batch)
        new_state = {"gen": gen_state, "dis": dis_state}
        return loss_gen, loss_dis, new_state, new_loss_state, aux

    def gen_stage(
        self,
        params_gen: Dict,
        state: Dict,
        rng_code: Array,
        data_batch: Dict,
        train: bool = True,
        code_batch: Optional[Dict] = None,
    ):
        """Generator half of the training computation.

        Split out from ``compute_losses`` so the train step can take a
        vjp of each stage separately: the discriminator pull then stops
        at the generated images instead of wastefully backpropagating
        through the whole generator. Returns (gen_out, gen_state,
        code_batch)."""
        batch_size = data_batch["x"].shape[0]
        if code_batch is None:
            if self.sample_same_class and data_batch.get("y") is not None:
                code_batch = self.sample_codes(
                    rng_code, batch_size, code_y=data_batch["y"])
            else:
                code_batch = self.sample_codes(rng_code, batch_size)
        gen_out, gen_state = self.Gen.apply(
            params_gen, state["gen"], code_batch, train=train
        )
        return gen_out, gen_state, code_batch

    def dis_stage(
        self,
        params_dis: Dict,
        gen_x: Array,
        code_y: Optional[Array],
        state: Dict,
        loss_state: LossState,
        rng_loss: Array,
        rng_gp: Array,
        data_batch: Dict,
    ):
        """Discriminator + loss half of the training computation: ONE D
        pass on concat(real, fake) (my_sngan.py:278-289), penalties, and
        the GANLoss dispatch. Differentiable in (params_dis, gen_x).
        Returns (loss_gen, loss_dis, dis_state, new_loss_state, aux)."""
        data_batch = decode_image_batch(data_batch)
        batch_size = data_batch["x"].shape[0]
        gen_out = {"x": gen_x, "y": code_y}
        dis_in = self.concat_two_batches(data_batch, gen_out)
        dis_out, dis_state = self.Dis.apply(
            params_dis, state["dis"], dis_in, train=True
        )
        s_x, s_gen = jnp.split(dis_out["x"], 2, axis=0)

        dis_penalty = None
        dis_scale = None
        # The penalties score B interpolates x_hat, so a conditional D
        # needs B labels — the real batch's (the reference runs Dis(x_hat)
        # unconditioned, my_sngan.py:160/189, but its conditional layers
        # would fail without y; dis_in['y'] has 2B rows and trips a
        # batch-dim mismatch).
        if self.loss_type in ("rep_gp", "rmb_gp", "fixed_g_gp", "fixed_t_gp"):
            dis_penalty = self.gp_weight * self.mmd_gradient_penalty(
                params_dis, state, rng_gp, data_batch["x"], gen_out["x"],
                s_x, s_gen, mode=self.loss_type, labels=data_batch.get("y"),
            )
        elif self.loss_type == "wasserstein":
            dis_penalty = self.gp_weight * self.gradient_penalty(
                params_dis, state, rng_gp, data_batch["x"], gen_out["x"],
                labels=data_batch.get("y"),
            )
        elif self.loss_type in ("rep_ds", "rmb_ds"):
            dis_scale = self.mmd_gradient_scale(
                params_dis, state, data_batch["x"], labels=data_batch.get("y"))

        loss_gen, loss_dis, new_loss_state, loss_aux = self.loss_hp.apply(
            s_gen, s_x, self.loss_type,
            batch_size=batch_size, d=self.score_size,
            dis_penalty=dis_penalty, dis_scale=dis_scale,
            rng=rng_loss, state=loss_state,
        )
        # loss_aux: the reference's per-loss TB summaries (kernel means,
        # Newton beta, coin state, penalty magnitudes, hist/* histograms)
        aux = {
            "s_x_mean": jnp.mean(s_x),
            "s_gen_mean": jnp.mean(s_gen),
            "x_gen_abs_mean": jnp.mean(jnp.abs(gen_out["x"])),
            **loss_aux,
        }
        return loss_gen, loss_dis, dis_state, new_loss_state, aux

    # ------------------------------------------------------------------
    # evaluation (my_sngan.py:499-649)
    # ------------------------------------------------------------------
    def eval_sampling(
        self,
        params: Dict,
        state: Dict,
        filename: str,
        sub_folder: str,
        mesh_num: Tuple[int, int] = (10, 10),
        mesh_mode=0,
        code_x=None,
        code_y=None,
        real_batch: Optional[Dict] = None,
        get_dis_score: bool = True,
        do_sprite: bool = True,
        do_embedding: bool = False,
        if_invert: bool = False,
        key=None,
        output_dir: Optional[str] = None,
        global_step: int = 0,
    ):
        """Generate a sample grid from MeshCode latents; write sprite PNG
        and optional TB-projector embedding of the discriminator scores
        (my_sngan.py:499-600). Returns a dict of produced file paths and
        arrays."""
        import jax as _jax

        from mmdgan_tpu.ops.mesh_code import MeshCode
        from mmdgan_tpu.utils.folders import prepare_folder
        from mmdgan_tpu.utils.sprite import (
            embedding_image_wrapper,
            write_sprite_wrapper,
        )

        if key is None:
            key = _jax.random.PRNGKey(0)
        if real_batch is not None:
            real_batch = dict(real_batch)
            real_batch["x"] = jnp.asarray(real_batch["x"])
            real_batch = decode_image_batch(real_batch)
        _, summary_folder, _ = prepare_folder(
            filename, sub_folder=sub_folder, set_folder=output_dir)
        batch_size = mesh_num[0] * mesh_num[1]
        if code_x is None:
            code_x = MeshCode(self.code_size, mesh_num=mesh_num).get_batch(
                mesh_mode, key=key)
        else:
            assert code_x.shape[0] == batch_size
        if code_y is None and self.sample_same_class and real_batch is not None:
            code_y = real_batch.get("y")
        code_batch = self.sample_codes(key, batch_size, code_x, code_y)
        x_gen = self.generate(params, state, code_batch=code_batch)
        out = {"x_gen": np.asarray(_jax.device_get(x_gen))}

        s_x = s_gen = None
        if get_dis_score and real_batch is not None:
            dis_in = self.concat_two_batches(
                real_batch, {"x": x_gen, "y": code_batch.get("y")})
            scores = self.discriminate(params, state, dis_in)
            s_x, s_gen = jnp.split(scores, 2, axis=0)
            out["s_x"] = np.asarray(_jax.device_get(s_x))
            out["s_gen"] = np.asarray(_jax.device_get(s_gen))

        if do_sprite:
            if real_batch is not None:
                out["sprite_real"] = write_sprite_wrapper(
                    np.asarray(_jax.device_get(real_batch["x"])), mesh_num,
                    filename, file_folder=summary_folder,
                    file_index=f"_r_{sub_folder}_{global_step}_{mesh_mode}",
                    if_invert=if_invert)
            out["sprite_gen"] = write_sprite_wrapper(
                out["x_gen"], mesh_num, filename, file_folder=summary_folder,
                file_index=f"_g_{sub_folder}_{global_step}_{mesh_mode}",
                if_invert=if_invert)

        if do_embedding and s_x is not None and real_batch is not None:
            s_all = np.concatenate([out["s_x"], out["s_gen"]], axis=0)
            x_all = np.concatenate(
                [np.asarray(_jax.device_get(real_batch["x"])), out["x_gen"]], axis=0)
            labels = np.concatenate(
                [np.ones(batch_size, np.int64), np.zeros(batch_size, np.int64)])
            out["embedding"] = embedding_image_wrapper(
                s_all, filename, var_name="x_vs_xg", file_folder=summary_folder,
                file_index=f"_x_vs_xg_{sub_folder}_{global_step}_{mesh_mode}",
                labels=labels, images=x_all,
                mesh_num=(mesh_num[0] * 2, mesh_num[1]), if_invert=if_invert)
        return out

    def mdl_score(
        self,
        params: Dict,
        state: Dict,
        real_batches,
        batch_size: int = 64,
        num_batch: int = 10,
        model: str = "v1",
        model_path: Optional[str] = None,
        key=None,
    ):
        """IS/FID (or MS-SSIM) evaluation (my_sngan.py:602-649): draw
        num_batch x batch_size samples and score them against real batches
        with the metric classifier.

        :param real_batches: iterator of host batches {'x': [B,H,W,C]}
        :param model: 'v1' (IS+FID) or 'ms_ssim'
        """
        import jax as _jax

        from mmdgan_tpu.metrics.scores import GenerativeModelMetric

        if key is None:
            key = _jax.random.PRNGKey(0)

        def gen_stream():
            k = key
            while True:
                k, sub = _jax.random.split(k)
                yield np.asarray(_jax.device_get(
                    self.generate(params, state, rng=sub, batch_size=batch_size)))

        def real_stream():
            for b in real_batches:
                x = b["x"] if isinstance(b, dict) else b
                if x.dtype == np.uint8:  # device_decode pipelines feed uint8
                    x = x.astype(np.float32) / 127.5 - 1.0
                yield x

        if model == "v1":
            metric = GenerativeModelMetric(model="v1", model_path=model_path)
            return metric.inception_score_and_fid(
                real_stream(), gen_stream(), num_batch=num_batch)
        if model == "ms_ssim":
            # pairwise within real and within generated (my_sngan.py:637-645)
            def halves(stream):
                for b in stream:
                    yield b[: len(b) // 2], b[len(b) // 2:]
            score_data = GenerativeModelMetric.ms_ssim_score(
                (a for a, _ in halves(real_stream())),
                (b for _, b in halves(real_stream())), num_batch=num_batch)
            score_gen = GenerativeModelMetric.ms_ssim_score(
                (a for a, _ in halves(gen_stream())),
                (b for _, b in halves(gen_stream())), num_batch=num_batch)
            return score_data, score_gen
        raise NotImplementedError(f"Model {model} not implemented.")
