"""Fitting a generative model with a Sinkhorn divergence
======================================================

Use the debiased Sinkhorn divergence as a data-fitting term inside a
standard optax training loop: fit the parameters (means, log-stds,
mixture logits) of a small Gaussian mixture to an observed point cloud.

TPU-native counterpart of the reference's
``examples/optimal_transport/model_fitting.py`` (L-BFGS on torch
parameters becomes Adam on a JAX pytree). Run:

    python examples/model_fitting.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from geomloss_tpu import SamplesLoss
from _example_utils import gaussian_mixture, get_pyplot, savefig, size


K = 3  # mixture components


def sample_model(params, key, n):
    """Reparametrized sampling (uniform mixture): differentiable w.r.t.
    the component means and log-stds."""
    k_means, k_logstd = params
    ks = jax.random.randint(key, (n,), 0, K)
    eps = jax.random.normal(
        jax.random.fold_in(key, 1), (n, 2), dtype=k_means.dtype
    )
    return k_means[ks] + jnp.exp(k_logstd[ks])[:, None] * eps


def main():
    N = size(1500)
    data, _ = gaussian_mixture(
        N, [(0.25, 0.3), (0.6, 0.7), (0.8, 0.25)], [0.05, 0.08, 0.04], seed=0
    )
    data = jnp.asarray(data)

    loss = SamplesLoss("sinkhorn", p=2, blur=0.03, diameter=2.0, scaling=0.7)
    key = jax.random.PRNGKey(0)
    params = (
        0.5 + 0.1 * jax.random.normal(key, (K, 2), dtype=jnp.float32),
        jnp.full((K,), jnp.log(0.1), jnp.float32),
    )
    opt = optax.adam(3e-2)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, key):
        def objective(params):
            xs = sample_model(params, key, N)
            return loss(xs, data)

        val, grads = jax.value_and_grad(objective)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, val

    n_iters = size(150, 15)
    for i in range(n_iters):
        key, sub = jax.random.split(key)
        params, opt_state, val = train_step(params, opt_state, sub)
        if i % max(1, n_iters // 10) == 0:
            print(f"iter {i:4d}: S_eps = {float(val):.5f}")

    means = np.asarray(params[0])
    print("fitted means:\n", means.round(3))

    plt = get_pyplot()
    if plt is not None:
        xs = np.asarray(sample_model(params, key, N))
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.scatter(*np.asarray(data).T, s=4, c="tab:gray", label="data")
        ax.scatter(*xs.T, s=4, c="tab:blue", alpha=0.5, label="model samples")
        ax.scatter(*means.T, s=80, c="red", marker="*", label="fitted means")
        ax.legend()
        ax.set_title("Sinkhorn-divergence model fitting (optax Adam)")
        savefig(plt, "model_fitting.png")

    return float(val)


if __name__ == "__main__":
    main()
