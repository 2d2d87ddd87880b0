"""Smoke tests: every gallery script runs end-to-end at reduced size.

Scripts are imported fresh with ``GEOMLOSS_TPU_SMOKE=1`` so their
``main()`` uses tiny problem sizes; each returns a scalar we sanity-check
for finiteness.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

EXAMPLES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)

SCRIPTS = [
    "gradient_flow",
    "plot_optimal_transport_2D",
    "plot_optimal_transport_color",
    "plot_optimal_transport_labels",
    "plot_optimal_transport_cluster",
    "plot_interpolation_3D",
    "plot_wasserstein_barycenters_1D",
    "plot_wasserstein_barycenters_2D",
    "plot_epsilon_scaling",
    "plot_kernel_truncation",
    "plot_transport_blur",
    "plot_gradient_flows_1D",
    "plot_gradient_flows_2D",
    "model_fitting",
    "transfer_labels_tractograms",
    "track_barycenter",
    "plot_profile",
    "plot_barycenter_samples",
]

pytestmark = pytest.mark.slow


def _load(name):
    os.environ["GEOMLOSS_TPU_SMOKE"] = "1"
    # _example_utils reads SMOKE at import time — force a fresh read:
    sys.modules.pop("_example_utils", None)
    path = os.path.join(EXAMPLES_DIR, name + ".py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("name", SCRIPTS)
def test_example_runs(name):
    mod = _load(name)
    out = mod.main() if name != "gradient_flow" else mod.main(n=256, steps=3)
    if isinstance(out, dict):
        assert all(np.isfinite(v) for v in out.values())
    elif out is not None:
        assert np.all(np.isfinite(out))
