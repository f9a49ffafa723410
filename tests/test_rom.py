"""POD bases, operator structures, and the Galerkin ROM."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gp_bayesopinf_tpu.rom import (
    PODBasis,
    EulerScaledBasis,
    QuadraticLiftedBasis,
    assemble_data_matrix,
    extract_operators,
    operator_dims,
    rom_rhs,
    GalerkinROM,
)
from gp_bayesopinf_tpu.ops import ckron


@pytest.fixture
def snapshots(rng):
    n, k, r_true = 60, 50, 4
    U, _ = np.linalg.qr(rng.standard_normal((n, r_true)))
    coeffs = rng.standard_normal((r_true, k))
    return U @ coeffs + 0.5  # nonzero mean exercises the shift


def test_pod_reconstruction(snapshots):
    basis = PODBasis.fit(snapshots, num_vectors=4)
    recon = np.asarray(basis.project(snapshots))
    np.testing.assert_allclose(recon, snapshots, atol=1e-9)
    assert basis.entries.shape == (60, 4)
    # Orthonormal columns.
    VtV = np.asarray(basis.entries.T @ basis.entries)
    np.testing.assert_allclose(VtV, np.eye(4), atol=1e-10)


def test_pod_svdvals_match_numpy(snapshots):
    basis = PODBasis.fit(snapshots, num_vectors=3)
    shifted = snapshots - snapshots.mean(axis=1, keepdims=True)
    expect = np.linalg.svd(shifted, compute_uv=False)
    np.testing.assert_allclose(np.asarray(basis.svdvals), expect, atol=1e-9)


def test_euler_scaled_basis_roundtrip(rng):
    n = 30
    states = np.concatenate([
        100 + rng.standard_normal((n, 20)),          # v ~ O(100)
        1e5 + 100 * rng.standard_normal((n, 20)),     # p ~ O(1e5)
        1 / 22 + 0.001 * rng.standard_normal((n, 20)),  # 1/rho
    ])
    basis = EulerScaledBasis.fit(states, num_vectors=10)
    recon = np.asarray(basis.project(states))
    # Relative accuracy per variable block.
    for blk_r, blk_s in zip(np.split(recon, 3), np.split(states, 3)):
        rel = np.abs(blk_r - blk_s).max() / np.abs(blk_s).max()
        assert rel < 0.2
    # compress/decompress consistency (exact round trip through coordinates).
    q = basis.compress(states)
    np.testing.assert_allclose(
        np.asarray(basis.compress(basis.decompress(q))), np.asarray(q), atol=1e-8
    )


def test_quadratic_lifted_basis(rng):
    # Low-rank latent structure so the lifted (q, q^2) matrix is captured
    # exactly by k-1 modes (rank of the shifted snapshot matrix).
    states = rng.uniform(0.1, 1.0, (40, 30))
    basis = QuadraticLiftedBasis.fit(states, num_vectors=29)
    recon = np.asarray(basis.project(states))
    assert recon.shape == states.shape
    np.testing.assert_allclose(recon, states, atol=1e-8)


def test_operator_dims_and_extract(rng):
    r, m = 3, 2
    dims = operator_dims("cAHBN", r, m)
    assert dims == {"c": 1, "A": 3, "H": 6, "B": 2, "N": 6}
    d = sum(dims.values())
    Ohat = jnp.asarray(rng.standard_normal((r, d)))
    ops = extract_operators(Ohat, "cAHBN", r, m)
    assert ops["c"].shape == (r,)
    assert ops["A"].shape == (r, r)
    assert ops["H"].shape == (r, 6)
    assert ops["B"].shape == (r, m)
    assert ops["N"].shape == (r, 6)
    np.testing.assert_allclose(ops["c"], Ohat[:, 0])
    np.testing.assert_allclose(ops["A"], Ohat[:, 1:4])


def test_data_matrix_consistent_with_rhs(rng):
    """D @ Ohat^T must equal the RHS evaluated at each snapshot."""
    r, m, k = 3, 2, 12
    Q = jnp.asarray(rng.standard_normal((r, k)))
    U = jnp.asarray(rng.standard_normal((m, k)))
    d = sum(operator_dims("cAHBN", r, m).values())
    Ohat = jnp.asarray(rng.standard_normal((r, d)))

    D = assemble_data_matrix(Q, U, "cAHBN")
    assert D.shape == (k, d)
    via_matrix = np.asarray(D @ Ohat.T).T  # (r, k)
    for j in range(k):
        rhs_j = rom_rhs(Ohat, Q[:, j], U[:, j], "cAHBN", r, m)
        np.testing.assert_allclose(via_matrix[:, j], rhs_j, rtol=1e-10)


def test_galerkin_rom_predict_linear(rng):
    """A pure-linear ROM (H = 0) must integrate to the matrix exponential."""
    import scipy.linalg

    r = 3
    A = np.diag([-0.5, -1.0, -2.0]) + 0.1 * rng.standard_normal((r, r))
    rom = GalerkinROM("cAH", state_dimension=r, substeps=8)
    d = rom.operator_dimension
    Ohat = np.zeros((r, d))
    Ohat[:, 1 : 1 + r] = A
    q0 = rng.standard_normal(r)
    t = np.linspace(0, 2, 40)
    got = np.asarray(rom.predict(jnp.asarray(Ohat), jnp.asarray(q0), jnp.asarray(t)))
    expect = np.stack([scipy.linalg.expm(A * tt) @ q0 for tt in t], axis=1)
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_galerkin_rom_quadratic_recovery(rng):
    """Integrating a known quadratic ROM and regressing its data matrix
    against exact derivatives must recover the operators (sanity loop)."""
    r = 2
    rom = GalerkinROM("cAH", state_dimension=r, substeps=16)
    d = rom.operator_dimension
    Ohat_true = 0.3 * rng.standard_normal((r, d))
    Ohat_true[:, 1 : 1 + r] -= 0.8 * np.eye(r)  # make it stable-ish
    q0 = np.array([0.5, -0.3])
    t = np.linspace(0, 3, 200)
    Q = rom.predict(jnp.asarray(Ohat_true), jnp.asarray(q0), jnp.asarray(t))
    dQ = jax.vmap(
        lambda q: rom_rhs(jnp.asarray(Ohat_true), q, None, "cAH", r, 0),
        in_axes=1,
        out_axes=1,
    )(Q)
    D = np.asarray(assemble_data_matrix(Q, None, "cAH"))
    Ohat_fit = np.linalg.lstsq(D, np.asarray(dQ).T, rcond=None)[0].T
    np.testing.assert_allclose(Ohat_fit, Ohat_true, atol=1e-6)


def test_rom_rhs_jacobian_matches_autodiff(rng):
    """Closed-form Jacobian equals jacfwd of the RHS for cAHBN."""
    from gp_bayesopinf_tpu.rom.operators import rom_rhs_jacobian

    r, m = 4, 2
    d = sum(operator_dims("cAHBN", r, m).values())
    Ohat = jnp.asarray(rng.standard_normal((r, d)))
    q = jnp.asarray(rng.standard_normal(r))
    u = jnp.asarray(rng.standard_normal(m))
    J = rom_rhs_jacobian(Ohat, q, u, "cAHBN", r, m)
    J_ad = jax.jacfwd(lambda qq: rom_rhs(Ohat, qq, u, "cAHBN", r, m))(q)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), rtol=1e-10)
    # Autonomous cAH variant too.
    d2 = sum(operator_dims("cAH", r, 0).values())
    O2 = jnp.asarray(rng.standard_normal((r, d2)))
    J2 = rom_rhs_jacobian(O2, q, None, "cAH", r, 0)
    J2_ad = jax.jacfwd(lambda qq: rom_rhs(O2, qq, None, "cAH", r, 0))(q)
    np.testing.assert_allclose(np.asarray(J2), np.asarray(J2_ad), rtol=1e-10)
