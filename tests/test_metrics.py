"""Metric tests: FID math vs scipy, IS closed-form cases, MS-SSIM
vs TF's implementation when available, MeshCode shapes, sprite writer,
end-to-end mdl_score with the random-feature classifier."""

import numpy as np
import pytest

from mmdgan_tpu.metrics import (
    GenerativeModelMetric,
    fid_from_activations,
    inception_score_from_logits,
    mean_cov_np,
    ms_ssim,
    sqrt_sym_mat_np,
    trace_sqrt_product_np,
)
from mmdgan_tpu.metrics.inception import RandomFeatureClassifier
from mmdgan_tpu.ops.mesh_code import MeshCode, kron_by_reshape, slerp


def test_sqrt_sym_mat(rng):
    a = rng.randn(6, 6)
    m = a @ a.T  # PSD
    r = sqrt_sym_mat_np(m)
    np.testing.assert_allclose(r @ r, m, rtol=1e-5, atol=1e-6)


def test_trace_sqrt_product_vs_scipy(rng):
    from scipy import linalg

    a = rng.randn(8, 8)
    b = rng.randn(8, 8)
    c1, c2 = a @ a.T, b @ b.T
    got = trace_sqrt_product_np(c1, c2)
    expect = np.real(np.trace(linalg.sqrtm(c1 @ c2)))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_fid_zero_for_identical(rng):
    x = rng.randn(500, 16)
    assert abs(fid_from_activations(x, x)) < 1e-6


def test_fid_gaussians_closed_form(rng):
    """FID between N(0,I) and N(mu,I) samples approaches ||mu||^2."""
    x = rng.randn(20000, 4)
    y = rng.randn(20000, 4) + np.array([1.0, 0, 0, 0])
    fid = fid_from_activations(x, y)
    np.testing.assert_allclose(fid, 1.0, atol=0.1)


def test_inception_score_bounds():
    # uniform logits -> IS = 1
    logits = np.zeros((100, 10))
    np.testing.assert_allclose(inception_score_from_logits(logits), 1.0, atol=1e-6)
    # perfectly confident + balanced -> IS = num_classes
    logits = np.eye(10)[np.arange(100) % 10] * 50.0
    np.testing.assert_allclose(inception_score_from_logits(logits), 10.0, rtol=1e-3)


def test_ms_ssim_identical_is_one(rng):
    x = rng.rand(2, 176, 176, 3).astype(np.float32) * 255
    s = np.asarray(ms_ssim(x, x, max_val=255.0))
    np.testing.assert_allclose(s, 1.0, atol=1e-4)


def test_ms_ssim_decreases_with_noise(rng):
    x = (rng.rand(2, 176, 176, 1) * 255).astype(np.float32)
    y = np.clip(x + rng.randn(*x.shape) * 40, 0, 255).astype(np.float32)
    s_same = float(np.mean(np.asarray(ms_ssim(x, x))))
    s_noisy = float(np.mean(np.asarray(ms_ssim(x, y))))
    assert s_noisy < s_same


def test_ms_ssim_matches_tf(rng):
    tf = pytest.importorskip("tensorflow")
    x = (rng.rand(2, 180, 180, 3) * 255).astype(np.float32)
    y = (rng.rand(2, 180, 180, 3) * 255).astype(np.float32)
    ours = np.asarray(ms_ssim(x, y, max_val=255.0))
    theirs = tf.image.ssim_multiscale(
        tf.constant(x), tf.constant(y), max_val=255).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=0.02, atol=0.01)


def test_random_feature_classifier(rng):
    clf = RandomFeatureClassifier(seed=0)
    imgs = rng.rand(7, 32, 32, 3).astype(np.float32) * 2 - 1
    logits, pool3 = clf(imgs)
    assert logits.shape == (7, 1001)
    assert pool3.shape == (7, 2048)
    # deterministic
    l2, p2 = RandomFeatureClassifier(seed=0)(imgs)
    np.testing.assert_allclose(logits, l2)


def test_generative_model_metric_end_to_end(rng):
    clf = RandomFeatureClassifier(seed=0)
    metric = GenerativeModelMetric(classifier=clf)

    def batches(shift):
        while True:
            yield (rng.rand(64, 16, 16, 3).astype(np.float32) * 2 - 1) * 0.5 + shift

    inc_x, inc_y, fid_xx, fid_xy = metric.inception_score_and_fid(
        batches(0.0), batches(0.3), num_batch=4)
    assert np.isfinite([inc_x, inc_y, fid_xx, fid_xy]).all()
    # self-FID sanity value much smaller than cross-FID
    assert fid_xx < fid_xy


def test_ref_stats_and_intra_fid(tmp_path, rng):
    clf = RandomFeatureClassifier(seed=0)
    metric = GenerativeModelMetric(classifier=clf)

    def batches():
        while True:
            yield rng.rand(32, 16, 16, 3).astype(np.float32) * 2 - 1

    path = metric.save_ref_stats(batches(), 4, str(tmp_path / "stats.npz"))
    fid = metric.intra_fid(path, batches(), num_batch=4)
    assert np.isfinite(fid) and fid < 50


def test_mesh_code_modes(key):
    mc = MeshCode(16, mesh_num=(5, 4))
    for mode in (0, 1, 2):
        z = mc.get_batch(mode, key=key)
        assert z.shape == (20, 16), mode
        assert np.isfinite(z).all()


def test_mesh_code_simple_grid():
    mc = MeshCode(2, mesh_num=(3, 3))
    z, x, y = mc.simple_grid()
    assert z.shape == (9, 2)
    np.testing.assert_allclose(z[0], [-1, -1])
    np.testing.assert_allclose(z[-1], [1, 1])


def test_kron_by_reshape(rng):
    a = rng.randn(2, 3)
    b = rng.randn(4, 1)
    np.testing.assert_allclose(kron_by_reshape(a, b), np.kron(a, b), rtol=1e-6)


def test_slerp_endpoints(rng):
    p0, p1 = rng.randn(8), rng.randn(8)
    np.testing.assert_allclose(slerp(p0, p1, 0.0), p0, atol=1e-5)
    np.testing.assert_allclose(slerp(p0, p1, 1.0), p1, atol=1e-5)


def test_sprite_writer(tmp_path, rng):
    from mmdgan_tpu.utils.sprite import write_sprite_wrapper

    imgs = rng.rand(6, 8, 8, 3).astype(np.float32) * 2 - 1
    path = write_sprite_wrapper(imgs, (2, 3), "t", str(tmp_path))
    import os
    assert os.path.isfile(path)
    from PIL import Image
    grid = np.asarray(Image.open(path))
    assert grid.shape == (16, 24, 3)


def test_embedding_writer(tmp_path, rng):
    from mmdgan_tpu.utils.sprite import embedding_image_wrapper

    emb = rng.randn(8, 4)
    imgs = rng.rand(8, 8, 8, 3).astype(np.float32) * 2 - 1
    labels = np.arange(8) % 2
    path = embedding_image_wrapper(
        emb, "t", "scores", str(tmp_path), labels=labels, images=imgs,
        mesh_num=(2, 4))
    import os
    assert os.path.isfile(path)
    assert os.path.isfile(str(tmp_path / "projector_config.pbtxt"))
