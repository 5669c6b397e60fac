"""Analysis layer: CTF, poses, MPCA/TwoSDR, purity metrics."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from cryo_ralib_tpu.analysis import (
    MPCA, R_from_eman, R_from_relion, TwoSDR, c_purity_score, compute_ctf,
    ctf_freqs, parse_pose_hdf, parse_pose_star, purity_score)
from cryo_ralib_tpu.analysis.metrics import contingency_matrix
from cryo_ralib_tpu.io.star import Table


def test_ctf_matches_reference_formula():
    freqs = ctf_freqs(32, apix=1.2)
    got = compute_ctf(freqs, 15000.0, 14000.0, 30.0, 300.0, 2.7, 0.1,
                      phase_shift=10.0, bfactor=50.0)
    # independent recomputation of the textbook formula
    volt = 300.0 * 1000
    cs = 2.7 * 1e7
    lam = 12.2639 / np.sqrt(volt + 0.97845e-6 * volt ** 2)
    x, y = freqs[:, 0], freqs[:, 1]
    ang = np.arctan2(y, x)
    s2 = x ** 2 + y ** 2
    df = 0.5 * (15000 + 14000 + (15000 - 14000)
                * np.cos(2 * (ang - np.deg2rad(30.0))))
    gamma = 2 * np.pi * (-0.5 * df * lam * s2 + 0.25 * cs * lam ** 3 * s2 ** 2) \
        - np.deg2rad(10.0)
    want = (np.sqrt(1 - 0.1 ** 2) * np.sin(gamma) - 0.1 * np.cos(gamma)) \
        * np.exp(-50.0 / 4 * s2)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_rotation_conventions():
    # orthonormality (sign flips preserve it: diag(1,-1,-1) conjugation)
    for fn in (R_from_eman, R_from_relion):
        R = fn(33.0, 71.0, -12.0)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    # vectorized == scalar
    a = np.array([0.0, 33.0, 120.0])
    b = np.array([10.0, 71.0, 45.0])
    y = np.array([5.0, -12.0, 240.0])
    Rv = R_from_eman(a, b, y)
    for i in range(3):
        np.testing.assert_allclose(Rv[i], R_from_eman(a[i], b[i], y[i]),
                                   atol=1e-12)
    # psi-only EMAN rotation = Rz(psi) with the origin sign flips applied
    psi = 30.0
    R = R_from_eman(0.0, 0.0, psi)
    c, s = np.cos(np.deg2rad(psi)), np.sin(np.deg2rad(psi))
    np.testing.assert_allclose(R, [[c, s, 0], [-s, c, 0], [0, 0, 1]],
                               atol=1e-12)


def test_parse_pose_tables():
    t = Table(["angle_psi", "shift_x", "shift_y", "class"],
              {"angle_psi": np.array([10.0, 20.0]),
               "shift_x": np.array([1.0, -1.0]),
               "shift_y": np.array([0.5, 2.0]),
               "class": np.array([0, 3])})
    euler, trans, rot, classes = parse_pose_hdf(t)
    assert euler.shape == (2, 3) and rot.shape == (2, 3, 3)
    np.testing.assert_allclose(euler[:, 2], [10.0, 20.0])
    np.testing.assert_allclose(trans, [[1.0, 0.5], [-1.0, 2.0]])

    ts = Table(["_rlnAngleRot", "_rlnAngleTilt", "_rlnAnglePsi",
                "_rlnOriginX", "_rlnOriginY"],
               {"_rlnAngleRot": np.array(["10.0"], object),
                "_rlnAngleTilt": np.array(["20.0"], object),
                "_rlnAnglePsi": np.array(["30.0"], object),
                "_rlnOriginX": np.array(["1.5"], object),
                "_rlnOriginY": np.array(["-2.5"], object)})
    euler, trans, rot = parse_pose_star(ts)
    np.testing.assert_allclose(euler[0], [10.0, 20.0, 30.0])
    np.testing.assert_allclose(rot[0], R_from_relion(10.0, 20.0, 30.0))


def _reference_mpca(arr, p0, q0):
    """Direct NumPy port of the reference alternating-eigs loop
    (src/utils_ralib.py:436-494) as the golden model."""
    n, p, q = arr.shape
    Y = arr.reshape(n, p * q).astype(np.float64)
    mY = Y.mean(0)
    Y = Y - mY
    rX = Y.reshape(n, p, q)
    Xm2 = rX.reshape(p * n, q)
    Xm1 = np.swapaxes(rX, 1, 2).reshape(q * n, p)
    SA = Xm2.T @ Xm2
    At = Bt = None
    prev = None
    for _ in range(30):
        w2, V2 = np.linalg.eigh(SA)
        Bt = V2[:, ::-1][:, :q0]
        SB = (Bt.T @ Xm2.T).reshape(q0 * n, p)
        SB = SB.T @ SB
        w1, V1 = np.linalg.eigh(SB)
        At = V1[:, ::-1][:, :p0]
        SA_ = (At.T @ Xm1.T).reshape(p0 * n, q)
        SA = SA_.T @ SA_
        en = np.sum((np.kron(At, Bt).T @ Y.T) ** 2) / n
        if prev is not None and en - prev < 1e-7:
            break
        prev = en
    factors = Y @ np.kron(At, Bt)
    return factors, At, Bt, mY


def test_mpca_matches_reference_math(rng):
    arr = rng.standard_normal((40, 12, 10)).astype(np.float32)
    # add low-rank structure so subspaces are well separated
    u = rng.standard_normal((12, 2))
    v = rng.standard_normal((10, 2))
    for i in range(40):
        arr[i] += 5.0 * np.outer(u @ rng.standard_normal(2),
                                 v @ rng.standard_normal(2)).astype(np.float32)
    f_ref, At_ref, Bt_ref, mY_ref = _reference_mpca(arr, 3, 3)
    f, At, Bt, mY = MPCA(arr, 3, 3)
    np.testing.assert_allclose(mY, mY_ref, atol=1e-4)
    # subspaces match up to per-column sign
    for got, want in ((At, At_ref), (Bt, Bt_ref)):
        overlap = np.abs(got.T @ want)
        np.testing.assert_allclose(np.diag(overlap), 1.0, atol=1e-3)
    # captured energy matches
    np.testing.assert_allclose((f ** 2).sum(), (f_ref ** 2).sum(), rtol=1e-3)


def test_twosdr_shapes_and_energy(rng):
    arr = rng.standard_normal((30, 10, 8)).astype(np.float32)
    f, Gt, At, Bt, mY = TwoSDR(arr, 4, 4, 5)
    assert f.shape == (30, 5)
    assert Gt.shape == (16, 5)
    assert At.shape == (10, 4) and Bt.shape == (8, 4)
    # rank-5 projection captures less energy than the full 4x4 core
    core, _, _, _ = MPCA(arr, 4, 4)
    assert (f ** 2).sum() <= (core ** 2).sum() + 1e-3
    # projections are orthonormal combinations: |f| == |core @ Gt|
    np.testing.assert_allclose((f ** 2).sum(), ((core @ Gt) ** 2).sum(),
                               rtol=1e-3)


def test_purity_scores():
    y_true = [0, 0, 1, 1, 2, 2]
    y_pred = [0, 0, 1, 1, 1, 2]
    m = contingency_matrix(y_true, y_pred)
    assert m.sum() == 6
    assert purity_score(y_true, y_pred) == pytest.approx(5 / 6)
    assert c_purity_score(y_true, y_pred) == pytest.approx(5 / 6)
    # sklearn parity (available in this image)
    from sklearn import metrics as skm
    msk = skm.cluster.contingency_matrix(y_true, y_pred)
    np.testing.assert_array_equal(m, msk)
