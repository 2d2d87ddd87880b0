"""Grid-path tests: separable softmin vs dense point-cloud softmin (exact),
pyramid/upsample vs torch golden values, sinkhorn_divergence on images vs
the tensorized point-cloud solver, and ImagesBarycenter sanity checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geomloss_tpu.ops.costs import cost_routines
from geomloss_tpu.ops.grid import C_transform, log_dens, pyramid, softmin_grid, upsample
from geomloss_tpu.ops.softmin import softmin_dense


def _grid_coords(shape):
    """Flattened coordinates arange(N)/N per axis, matching softmin_grid."""
    axes = [np.arange(n) / n for n in shape]
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.stack([m.ravel() for m in mesh], axis=-1)


@pytest.mark.parametrize("p", [1, 2])
@pytest.mark.parametrize("shape", [(8,), (8, 8), (4, 4, 4)])
def test_softmin_grid_matches_dense(p, shape):
    rng = np.random.RandomState(0)
    B = 2
    h = jnp.asarray(rng.randn(B, *shape))
    eps = 0.07

    got = softmin_grid(eps, p, h)

    coords = jnp.asarray(_grid_coords(shape))  # (N_total, D)
    if p == 2:
        C = cost_routines[2](coords, coords)  # |x-y|^2 / 2 — separable
    else:
        # For p = 1 the separable grid softmin implements the *Manhattan*
        # cost sum_d |x_d - y_d| (reference utils.py:244-279 does the same):
        C = jnp.abs(coords[:, None, :] - coords[None, :, :]).sum(-1)
    expected = softmin_dense(eps, C[None], h.reshape(B, -1)).reshape(h.shape)

    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-8, atol=1e-10)


def test_pyramid_and_upsample_match_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    img = rng.rand(2, 3, 16, 16)

    # pyramid: 4 * avg_pool2d(x, 2) == sum pooling
    ours = pyramid(jnp.asarray(img), D=2)
    theirs = [torch.tensor(img)]
    t = torch.tensor(img)
    for _ in range(4):
        t = 4 * F.avg_pool2d(t, 2)
        theirs.append(t)
    theirs.reverse()
    assert len(ours) == len(theirs)
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o), t.numpy(), rtol=1e-12)

    # upsample: bilinear x2, align_corners=False
    up_ours = upsample(jnp.asarray(img), D=2)
    up_torch = F.interpolate(
        torch.tensor(img), scale_factor=2, mode="bilinear", align_corners=False
    )
    np.testing.assert_allclose(np.asarray(up_ours), up_torch.numpy(), rtol=1e-6, atol=1e-12)


def test_c_transform_brute_force():
    rng = np.random.RandomState(2)
    G = rng.randn(1, 6, 6)
    tau, p = 0.8, 2
    got = np.asarray(C_transform(jnp.asarray(G), tau=tau, p=p))

    # Brute force over the 36 grid points (pixel coordinates 0..N-1):
    N = 6
    xs = np.stack(np.meshgrid(np.arange(N), np.arange(N), indexing="ij"), -1).reshape(-1, 2)
    C = ((xs[:, None, :] - xs[None, :, :]) ** 2).sum(-1) / (2 * tau)
    expected = (G.reshape(1, -1)[:, None, :] - C[None]).max(-1).reshape(1, N, N)
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def _gaussian_image(N, cx, cy, s):
    x = np.arange(N) / N
    g = np.exp(-((x[:, None] - cx) ** 2 + (x[None, :] - cy) ** 2) / (2 * s**2))
    return g / g.sum()


def test_sinkhorn_divergence_images_vs_pointcloud():
    from geomloss_tpu import SamplesLoss, sinkhorn_divergence

    N = 16
    a = _gaussian_image(N, 0.3, 0.3, 0.1)
    b = _gaussian_image(N, 0.7, 0.6, 0.15)

    val_grid = sinkhorn_divergence(
        jnp.asarray(a)[None], jnp.asarray(b)[None], p=2, blur=0.1, scaling=0.8
    )

    coords = jnp.asarray(_grid_coords((N, N)))
    loss = SamplesLoss("sinkhorn", p=2, blur=0.1, scaling=0.8, diameter=1.0,
                       backend="tensorized")
    val_cloud = loss(
        jnp.asarray(a.ravel()), coords, jnp.asarray(b.ravel()), coords
    )
    np.testing.assert_allclose(
        float(val_grid[0]), float(val_cloud), rtol=0.05, atol=1e-5
    )


def test_sinkhorn_divergence_self_is_zero_and_symmetric():
    from geomloss_tpu import sinkhorn_divergence

    N = 16
    a = jnp.asarray(_gaussian_image(N, 0.4, 0.4, 0.12))[None]
    b = jnp.asarray(_gaussian_image(N, 0.6, 0.5, 0.1))[None]

    self_val = float(sinkhorn_divergence(a, a, blur=0.1)[0])
    assert abs(self_val) < 1e-6

    ab = float(sinkhorn_divergence(a, b, blur=0.1)[0])
    ba = float(sinkhorn_divergence(b, a, blur=0.1)[0])
    assert ab > 0
    np.testing.assert_allclose(ab, ba, rtol=1e-6)


def test_sinkhorn_divergence_gradients():
    from geomloss_tpu import sinkhorn_divergence

    N = 16
    a = jnp.asarray(_gaussian_image(N, 0.4, 0.4, 0.12))[None]
    b = jnp.asarray(_gaussian_image(N, 0.6, 0.5, 0.1))[None]

    g = jax.grad(lambda a: sinkhorn_divergence(a, b, blur=0.1)[0])(a)
    assert g.shape == a.shape
    assert np.all(np.isfinite(np.asarray(g)))
    # Moving mass towards the target should decrease the loss: the gradient
    # cannot vanish identically.
    assert float(jnp.abs(g).max()) > 0


def test_volumes_and_images_loss_classes():
    from geomloss_tpu import ImagesLoss, VolumesLoss

    N = 8
    a2 = _gaussian_image(N, 0.3, 0.4, 0.15)
    b2 = _gaussian_image(N, 0.6, 0.6, 0.15)
    v = float(ImagesLoss(blur=0.1)(jnp.asarray(a2), jnp.asarray(b2)))
    assert np.isfinite(v) and v > 0

    rng = np.random.RandomState(3)
    a3 = rng.rand(N, N, N)
    a3 /= a3.sum()
    b3 = rng.rand(N, N, N)
    b3 /= b3.sum()
    v3 = float(VolumesLoss(blur=0.2)(jnp.asarray(a3), jnp.asarray(b3)))
    assert np.isfinite(v3)


def test_images_barycenter_identity():
    from geomloss_tpu import ImagesBarycenter

    N = 16
    img = _gaussian_image(N, 0.5, 0.5, 0.12)
    measures = jnp.asarray(np.stack([img, img])[None])  # (1, 2, N, N)
    weights = jnp.asarray([[0.5, 0.5]])

    bar = ImagesBarycenter(measures, weights)
    assert bar.shape == (1, 1, N, N)
    bar_np = np.asarray(bar[0, 0])
    # Mass conservation and recovery of the common input:
    np.testing.assert_allclose(bar_np.sum(), 1.0, rtol=1e-2)
    assert np.abs(bar_np - img).max() < 0.05 * img.max()


def test_images_barycenter_interpolates_and_differentiates():
    from geomloss_tpu import ImagesBarycenter

    N = 16
    a = _gaussian_image(N, 0.3, 0.5, 0.1)
    b = _gaussian_image(N, 0.7, 0.5, 0.1)
    measures = jnp.asarray(np.stack([a, b])[None])

    bar = ImagesBarycenter(measures, jnp.asarray([[0.5, 0.5]]))
    bar_np = np.asarray(bar[0, 0])
    # The W2 barycenter of two shifted bumps is a central bump:
    com_x = (np.arange(N) / N * bar_np.sum(1)).sum() / bar_np.sum()
    assert 0.4 < com_x < 0.6

    # Gradients flow through the backward_iterations tail:
    g = jax.grad(
        lambda w: ImagesBarycenter(measures, w)[0, 0, N // 2, N // 2]
    )(jnp.asarray([[0.5, 0.5]]))
    assert np.all(np.isfinite(np.asarray(g)))
