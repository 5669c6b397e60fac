"""Test harness config: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores JAX_PLATFORMS from the environment in this
# image; the config route wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1000)


def make_class_bases(n_classes, nx):
    """Well-separated class templates: each class is a ring at a distinct
    radius carrying 2+k gaussian bumps (rotationally informative), unit-σ
    normalized so no class dominates the weighted ccf by brightness."""
    yy, xx = np.mgrid[0:nx, 0:nx]
    cy = cx = nx // 2
    out = np.zeros((n_classes, nx, nx), np.float32)
    for k in range(n_classes):
        r0 = nx * 0.12 + k * nx * 0.07
        img = np.zeros((nx, nx), np.float64)
        n_bumps = 2 + k
        for b in range(n_bumps):
            ang = 2 * np.pi * b / n_bumps + 0.5 * k
            by = cy + r0 * np.sin(ang)
            bx = cx + r0 * np.cos(ang)
            img += np.exp(-((yy - by) ** 2 + (xx - bx) ** 2) / (2 * 2.5 ** 2))
        img -= img.mean()
        img /= img.std()
        out[k] = img.astype(np.float32)
    return out


def make_disc_stack(rng, n, nx, blobs=3):
    """Synthetic particle-like images: a few gaussian blobs inside a disc,
    plus noise — enough structure for alignment peaks to be unambiguous."""
    yy, xx = np.mgrid[0:nx, 0:nx]
    imgs = np.zeros((n, nx, nx), np.float32)
    for i in range(n):
        img = np.zeros((nx, nx), np.float64)
        for _ in range(blobs):
            cy = rng.uniform(nx * 0.3, nx * 0.7)
            cx = rng.uniform(nx * 0.3, nx * 0.7)
            s = rng.uniform(1.5, 4.0)
            img += rng.uniform(0.5, 2.0) * np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
        img += rng.normal(0, 0.05, (nx, nx))
        imgs[i] = img.astype(np.float32)
    return imgs
