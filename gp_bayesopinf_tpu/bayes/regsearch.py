"""Regularization auto-search: batched log-grid + bounded 1-D refinement.

Behavioral spec: reference ``*/step3_estimate.py`` — for each candidate
lambda on a log grid (81 points for PDEs, 22 for ODEs), draw 20 posterior
samples, integrate each over BOTH the prediction and the estimation time
domains, hard-reject the candidate (objective ceiling 1e12) if ANY draw is
unstable or the covariance is not SPD, otherwise score by the relative
error of the draw-mean against the GP state estimates; warn and widen
bounds when the grid best is an endpoint; then refine with a bounded 1-D
scalar minimization between the neighbors; fall back to the grid best if
the refinement fails.

TPU-native shape: all G x ndraws x L-trajectory x 2-domain integrations for
the WHOLE GRID run as one jitted, vmapped computation; the refinement calls
the same jitted single-candidate objective from a host-side bounded search
(the scipy ``minimize_scalar(method="bounded")`` driver — control flow on
host, numerics on device — preserving the reference's search semantics
exactly).
"""

import logging as _logging
from typing import Callable, NamedTuple, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import scipy.optimize

from ..solve.lstsq import WeightedLSTSQ
from ..solve.ivp import stability_mask

MAXOPTVAL = 1e12  # Objective ceiling for rejected candidates.
DEFAULT_GRID_PDE = np.logspace(-16, 4, 81)
DEFAULT_GRID_ODE = np.logspace(-16, 5, 22)


class RegSearchResult(NamedTuple):
    regularizer: float  # chosen lambda
    grid_best: float  # best grid point
    grid_errors: np.ndarray  # (G,) objective per grid candidate
    refined: bool  # True if the 1-D optimization succeeded


class KernelScreenSpec(NamedTuple):
    """Kernel-eligibility descriptor for searches without a GalerkinROM.

    A parametric truth model whose right-hand side is itself quadratic
    (e.g. SEIRD2: posterior draws of its 4 regression parameters define
    "cAH" operator rows via ``SEIRD2.cah_operators``) can route the grid
    screen through the fused ensemble kernels by passing this spec as
    ``rom=`` together with ``operator_map=``; it carries exactly the
    attributes the kernel objective reads off a ``GalerkinROM``.
    """

    structure: str  # "cAH" (autonomous) or "cAHBN" (with inputs)
    state_dimension: int
    substeps: int = 4
    input_dimension: int = 0
    ivp_method: str = "rk4"


def _make_objective(
    lstsq: WeightedLSTSQ,
    predict_fns: Sequence[Callable],
    initial_conditions: jnp.ndarray,
    t_pred: jnp.ndarray,
    t_est: jnp.ndarray,
    snapshots_est: jnp.ndarray,
    ndraws: int,
    screen_dtype=None,
):
    """Build the jitted per-candidate objective.

    Parameters
    ----------
    predict_fns : length-L sequence of callables
        ``predict_fns[l](operators, q0, t_eval) -> (r, k)`` — the ROM (or
        parametric ODE) integrated for one trajectory's inputs. Static
        Python loop over L (L <= 5 in the reference workloads).
    initial_conditions : (L, r) array of per-trajectory ICs.
    snapshots_est : (L, r, m') GP state estimates per trajectory.
    """
    L = len(predict_fns)
    shifts = jnp.mean(snapshots_est, axis=2)  # (L, r)
    limits = 5.0 * jnp.max(
        jnp.abs(snapshots_est - shifts[:, :, None]), axis=2
    )  # (L, r)
    norms = jnp.sqrt(jnp.sum(snapshots_est**2, axis=(1, 2)))  # (L,)

    # Candidate screening may run in reduced precision: the integrations
    # here only gate stability and rank candidates; the selected lambda's
    # posterior is rebuilt downstream at full precision.
    cast = (lambda x: x.astype(screen_dtype)) if screen_dtype else (lambda x: x)
    t_pred_s, t_est_s = cast(t_pred), cast(t_est)
    shifts_s, limits_s = cast(shifts), cast(limits)
    snaps_s, norms_s = cast(snapshots_est), cast(norms)

    def objective(lam, key):
        """Objective for a single regularization candidate."""
        spd = lstsq.posterior_spd(lam)
        ohats = cast(lstsq.sample(lam, key, ndraws))  # (ndraws, r, d)

        total_err = 0.0
        all_stable = spd
        for ell in range(L):
            q0 = cast(initial_conditions[ell])
            sol_pred = jax.vmap(
                lambda O: predict_fns[ell](O, q0, t_pred_s)
            )(ohats)
            sol_est = jax.vmap(
                lambda O: predict_fns[ell](O, q0, t_est_s)
            )(ohats)
            stable = jnp.all(
                stability_mask(sol_pred, shifts_s[ell], limits_s[ell])
            ) & jnp.all(stability_mask(sol_est, shifts_s[ell], limits_s[ell]))
            all_stable = all_stable & stable

            mean_sol = jnp.mean(sol_est, axis=0)  # (r, m')
            err = (
                jnp.sqrt(jnp.sum((mean_sol - snaps_s[ell]) ** 2))
                / norms_s[ell]
            )
            total_err = total_err + err

        err = total_err / L
        err = jnp.where(jnp.isfinite(err), err, MAXOPTVAL)
        return jnp.where(all_stable, err, MAXOPTVAL)

    return objective


def _make_kernel_objective(
    lstsq: WeightedLSTSQ,
    rom,
    initial_conditions: jnp.ndarray,
    t_pred: jnp.ndarray,
    t_est: jnp.ndarray,
    snapshots_est: jnp.ndarray,
    ndraws: int,
    use_pallas: bool,
    input_funcs: Optional[Sequence[Callable]] = None,
    operator_map: Optional[Callable] = None,
):
    """Batched grid objective backed by the ensemble-screening megakernels.
    Semantically identical to ``_make_objective`` vmapped over candidates,
    but all draw states stay in VMEM and trajectories are never
    materialized. Two kernel families:

    * autonomous "cAH" -> fused RK4 screen (``quadratic_ensemble_screen``);
    * "cAHBN" with ``input_funcs`` -> fused implicit SDIRK2+Newton screen
      (``cahbn_ensemble_screen``), inputs pre-evaluated at every
      integrator abscissa (the heat-multi pipeline's dominant stage).
    """
    import jax

    from ..ops.ensemble_pallas import (
        _input_stage_times,
        cahbn_ensemble_screen,
        cahbn_ensemble_screen_xla,
        quadratic_ensemble_screen,
        quadratic_ensemble_screen_xla,
    )

    L = snapshots_est.shape[0]
    r = rom.state_dimension
    shifts = jnp.mean(snapshots_est, axis=2)
    limits = 5.0 * jnp.max(jnp.abs(snapshots_est - shifts[:, :, None]), axis=2)
    norms = jnp.sqrt(jnp.sum(snapshots_est**2, axis=(1, 2))).astype(jnp.float32)

    if rom.structure == "cAH":
        screen = (
            quadratic_ensemble_screen
            if use_pallas
            else quadratic_ensemble_screen_xla
        )

        def screen_pred(ohats, ell):
            return screen(
                ohats, initial_conditions[ell], t_pred,
                shifts[ell], limits[ell],
                nd=ndraws, substeps=rom.substeps, track_error=False,
            )

        def screen_est(ohats, ell):
            return screen(
                ohats, initial_conditions[ell], t_est,
                shifts[ell], limits[ell], snapshots_est[ell],
                nd=ndraws, substeps=rom.substeps,
            )
    else:  # "cAHBN": implicit SDIRK2 kernel with pre-evaluated inputs.
        iscreen = (
            cahbn_ensemble_screen if use_pallas else cahbn_ensemble_screen_xla
        )

        def _u_table(f, ts):
            # Input functions follow the ``rom.data_matrix`` convention
            # u(times) -> (nu, n); the kernels take (n, nu).
            return jnp.atleast_2d(jnp.asarray(f(ts))).T

        u_pred = [
            _u_table(f, _input_stage_times(t_pred, rom.substeps))
            for f in input_funcs
        ]
        u_est = [
            _u_table(f, _input_stage_times(t_est, rom.substeps))
            for f in input_funcs
        ]

        def screen_pred(ohats, ell):
            return iscreen(
                ohats, initial_conditions[ell], t_pred,
                shifts[ell], limits[ell], u_pred[ell],
                nd=ndraws, substeps=rom.substeps, track_error=False,
            )

        def screen_est(ohats, ell):
            return iscreen(
                ohats, initial_conditions[ell], t_est,
                shifts[ell], limits[ell], u_est[ell], snapshots_est[ell],
                nd=ndraws, substeps=rom.substeps,
            )

    def grid_objective(lams, keys):
        G = lams.shape[0]
        spd = jax.vmap(lstsq.posterior_spd)(lams)
        draws = jax.vmap(lambda lam, k: lstsq.sample(lam, k, ndraws))(
            lams, keys
        )  # (G, ndraws, rows, cols) — rows may be a parameter row count
        draws = draws.reshape((G * ndraws,) + draws.shape[2:])
        # A parametric model's draws are mapped to operator rows here
        # (e.g. SEIRD2 (1, 4) parameter rows -> (5, 21) "cAH" operators).
        ohats = (
            jax.vmap(operator_map)(draws)
            if operator_map is not None
            else draws.reshape(G * ndraws, r, -1)
        )

        stable = spd
        err = jnp.zeros(G, dtype=jnp.float32)
        for ell in range(L):
            st_p, _ = screen_pred(ohats, ell)
            st_e, err_sq = screen_est(ohats, ell)
            stable = stable & jnp.all(
                (st_p & st_e).reshape(G, ndraws), axis=1
            )
            err = err + jnp.sqrt(err_sq) / norms[ell]

        err = err / L
        return jnp.where(
            stable & jnp.isfinite(err), err.astype(jnp.float64), MAXOPTVAL
        )

    return jax.jit(grid_objective)


def _mesh_sharded_grid(batched: Callable, mesh, axis: str) -> Callable:
    """Spread a batched grid objective's candidate axis over a device mesh.

    The grid screen is embarrassingly parallel over candidates (the
    reference evaluates them serially: ``PDEs/step3_estimate.py`` loop),
    so each device runs the identical per-shard program — including the
    Pallas megakernel, which executes per device under ``shard_map`` —
    with no collectives. Candidates are padded by wrapping to a multiple
    of the mesh axis size and the padding is discarded.
    """
    from jax.sharding import PartitionSpec as P

    fn = jax.shard_map(
        batched,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    ndev = int(mesh.shape[axis])

    def call(lams, keys):
        G = lams.shape[0]
        Gp = -(-G // ndev) * ndev
        if Gp == G:
            # Aligned grid: no padding. The wrap-index below is a gather
            # even when it is the identity, and on sharded operands XLA
            # lowers it as an all-gather — the aligned path must stay
            # collective-free (tests/test_pipeline.py asserts on the HLO).
            return fn(lams, keys)
        idx = jnp.arange(Gp) % G
        return fn(lams[idx], keys[idx])[:G]

    return call


def auto_regularize(
    lstsq: WeightedLSTSQ,
    predict_fns: Sequence[Callable],
    initial_conditions,
    t_pred,
    t_est,
    snapshots_est,
    key,
    grid: Optional[np.ndarray] = None,
    ndraws: int = 20,
    verbose: bool = True,
    screen_dtype=None,
    rom=None,
    use_kernel: Optional[bool] = None,
    screen_on_host: bool = False,
    refine_failure: str = "fallback",
    input_funcs: Optional[Sequence[Callable]] = None,
    operator_map: Optional[Callable] = None,
    mesh=None,
    mesh_axis: str = "draw",
) -> RegSearchResult:
    """Select the regularization hyperparameter.

    See ``_make_objective`` for the trajectory-batched arguments. For the
    single-trajectory pipelines pass length-1 sequences / leading axes.

    When ``rom`` is an autonomous "cAH" ``GalerkinROM`` — or a "cAHBN"
    one with per-trajectory ``input_funcs`` — the grid phase can run
    through the Pallas ensemble-screening megakernels (``use_kernel``;
    defaults to True on TPU backends). A parametric truth model whose
    RHS is quadratic can use the same kernels by passing a
    ``KernelScreenSpec`` as ``rom`` plus an ``operator_map`` that expands
    each sampled parameter row into "cAH" operator rows (SEIRD2:
    ``models.seird.SEIRD2.cah_operators``).

    ``refine_failure`` selects the reference's divergent semantics when the
    bounded refinement fails: the PDEs pipeline falls back to the grid best
    (``PDEs/step3_estimate.py:176-178``, the default) while PDEsMulti
    raises (``PDEsMulti/step3_estimate.py:207``, ``refine_failure="raise"``).

    ``mesh`` (a ``jax.sharding.Mesh`` with axis ``mesh_axis``) spreads the
    grid phase's candidates over the device mesh via ``shard_map`` — the
    screen is embarrassingly parallel, so multi-chip scaling is linear in
    the mesh axis size; results are identical to the single-device path
    (same per-candidate keys). The bounded refinement stays single-device.
    """
    if refine_failure not in ("fallback", "raise"):
        raise ValueError("refine_failure must be 'fallback' or 'raise'")
    from ..utils.hostmath import to_accelerator

    grid = DEFAULT_GRID_PDE if grid is None else np.sort(np.atleast_1d(grid))
    initial_conditions = jnp.atleast_2d(jnp.asarray(initial_conditions))
    snapshots_est = jnp.asarray(snapshots_est)
    if snapshots_est.ndim == 2:
        snapshots_est = snapshots_est[None]

    # The regression factorization is built on the host (true f64); the
    # screening integrations run on the accelerator — move the spectra
    # there (sampling precision is f32-safe). ``screen_on_host`` keeps the
    # whole search host-side instead (used for implicit-integrator ROMs,
    # whose compiled nested Newton/solve graphs crash this TPU runtime).
    if not screen_on_host:
        lstsq = to_accelerator(lstsq)
        initial_conditions = to_accelerator(initial_conditions)
        snapshots_est = to_accelerator(snapshots_est)

    import jax as _jax

    kernel_eligible = rom is not None and (
        (
            getattr(rom, "structure", None) == "cAH"
            and getattr(rom, "input_dimension", 0) == 0
        )
        or (
            getattr(rom, "structure", None) == "cAHBN"
            and input_funcs is not None
            and getattr(rom, "ivp_method", None) == "dirk2"
        )
    )
    if use_kernel is None:
        use_kernel = kernel_eligible and _jax.default_backend() == "tpu"
    elif use_kernel and not kernel_eligible:
        raise ValueError(
            "use_kernel requires an autonomous 'cAH' GalerkinROM or a "
            "'cAHBN' dirk2 GalerkinROM with input_funcs"
        )
    if use_kernel and isinstance(rom, KernelScreenSpec) and operator_map is None:
        # Without the map, parameter-row draws would hit the generic
        # (G*ndraws, r, -1) reshape: an opaque trace error at best,
        # silently garbage operator rows at worst.
        raise ValueError(
            "a KernelScreenSpec rom requires operator_map (the draw -> "
            "operator-rows expansion, e.g. SEIRD2.cah_operators)"
        )

    if use_kernel:
        import os as _os

        # The Pallas megakernel is DEFAULT-ON for TPU backends (round 2:
        # the dynamic lane-axis snapshot read that crashed the axon Mosaic
        # toolchain was replaced with a sublane-layout read; flagship grid
        # ~31 ms warm vs ~50 ms for the jitted XLA twin, bit-identical
        # stability decisions). GPBOI_PALLAS=0 opts out, and any Mosaic
        # compile/runtime failure automatically falls back to the
        # semantically-identical XLA twin instead of hard-failing the run.
        def _build_kernel_objective(use_pallas):
            return _make_kernel_objective(
                lstsq,
                rom,
                initial_conditions,
                jnp.asarray(t_pred),
                jnp.asarray(t_est),
                snapshots_est,
                ndraws,
                use_pallas=use_pallas,
                input_funcs=input_funcs,
                operator_map=operator_map,
            )

        _obj = {
            "pallas": (
                _jax.default_backend() == "tpu"
                and _os.environ.get("GPBOI_PALLAS", "1") != "0"
            )
        }
        _obj["fn"] = _build_kernel_objective(_obj["pallas"])

        def _kernel_call(entry):
            """Call ``_obj[entry]`` with the Pallas->XLA-twin fallback.

            The fallback must wrap the OUTERMOST program: under
            ``shard_map`` the kernel objective is only traced inside
            ``batched``, and a Mosaic compile error surfaces when the
            sharded program itself compiles — so the sharded entry gets
            its own wrapper rebuilt alongside ``_obj["fn"]``.
            """

            def call(lams, ks):
                try:
                    # np.asarray forces real execution HERE: under async
                    # dispatch a device-side runtime failure would
                    # otherwise surface at the caller's readback, outside
                    # this handler (and under the axon tunnel
                    # block_until_ready returns at enqueue time, so only
                    # a host copy truly waits). The caller converts to
                    # NumPy anyway.
                    return np.asarray(_obj[entry](lams, ks))
                except Exception as exc:  # Mosaic compile OR runtime failure
                    if not _obj["pallas"]:
                        raise
                    _logging.warning(
                        "Pallas ensemble megakernel failed (%r); "
                        "falling back to the XLA twin", exc,
                    )
                    _obj["pallas"] = False
                    _obj["fn"] = _build_kernel_objective(False)
                    if "sharded_mesh" in _obj:
                        _obj["sharded"] = _mesh_sharded_grid(
                            _obj["fn"], *_obj["sharded_mesh"]
                        )
                    return np.asarray(_obj[entry](lams, ks))

            return call

        batched = _kernel_call("fn")
        # Single-candidate evaluations (the bounded refinement) pad the
        # candidate to the grid phase's chunk width and reuse ITS program:
        # a dedicated G=1 program would cost its own multi-MB executable
        # — a real per-process load through the accelerator tunnel and a
        # separate cold compile — for identical decisions (each padded
        # slot is an independent copy; slot 0 is returned).
        _single_width = min(16, max(len(grid), 1))

        def single(lam, k):
            lams = jnp.broadcast_to(jnp.asarray(lam), (_single_width,))
            ks = jnp.broadcast_to(k[None], (_single_width,) + k.shape)
            return batched(lams, ks)[0]
    else:
        if screen_dtype is None and _jax.default_backend() == "tpu":
            # No native f64 on TPU; screening tolerates f32 by design.
            screen_dtype = jnp.float32
        objective = _make_objective(
            lstsq,
            predict_fns,
            initial_conditions,
            jnp.asarray(t_pred),
            jnp.asarray(t_est),
            snapshots_est,
            ndraws,
            screen_dtype=screen_dtype,
        )
        if screen_on_host:
            from ..utils.hostmath import host_jit

            batched = host_jit(jax.vmap(objective))
            single = host_jit(objective)
        else:
            batched = jax.jit(jax.vmap(objective))
            single = jax.jit(objective)

    if len(grid) == 1:
        best_reg = float(grid[0])
        grid_errors = np.array([np.nan])
        bounds = [best_reg / 10.0, best_reg * 10.0]
    else:
        keys = jax.random.split(key, len(grid))
        grid_j = jnp.asarray(grid, dtype=jnp.result_type(float))
        # Evaluate in fixed-size chunks: one device execution per chunk
        # keeps single-program runtimes bounded (long monolithic programs
        # trip accelerator watchdogs for the heavier implicit-ROM grids)
        # and bounds peak memory. The last chunk is padded by repetition.
        G = len(grid)
        grid_eval = batched
        CHUNK = min(16, G)
        if mesh is not None and not screen_on_host:
            CHUNK = min(16 * int(mesh.shape[mesh_axis]), G)
            if use_kernel:
                # Shard the RAW kernel objective and route calls through
                # the fallback wrapper (see ``_kernel_call``): wrapping
                # ``batched`` itself would bury the try/except at trace
                # time, turning a Mosaic failure into a hard error.
                _obj["sharded_mesh"] = (mesh, mesh_axis)
                _obj["sharded"] = _mesh_sharded_grid(
                    _obj["fn"], mesh, mesh_axis
                )
                grid_eval = _kernel_call("sharded")
            else:
                grid_eval = _mesh_sharded_grid(batched, mesh, mesh_axis)
        parts = []
        for s in range(0, G, CHUNK):
            idx = np.arange(s, s + CHUNK) % G  # pad by wrapping
            part = grid_eval(grid_j[idx], keys[idx])
            parts.append(np.asarray(part)[: min(CHUNK, G - s)])
        grid_errors = np.concatenate(parts)[:G]
        if verbose:
            for lam, e in zip(grid, grid_errors):
                tag = "UNSTABLE" if e >= MAXOPTVAL else f"{e:.2%} error"
                print(f"reg {lam:.4e}: {tag}")
        if np.all(grid_errors >= MAXOPTVAL):
            raise ValueError("grid search failed: every candidate unstable")
        ibest = int(np.argmin(grid_errors))
        best_reg = float(grid[ibest])
        if ibest == 0:
            print("WARNING: extend regularizer_grid to the left!")
            bounds = [best_reg / 100.0, float(grid[1])]
        elif ibest == len(grid) - 1:
            print("WARNING: extend regularizer_grid to the right!")
            bounds = [float(grid[-2]), best_reg * 100.0]
        else:
            bounds = [float(grid[ibest - 1]), float(grid[ibest + 1])]
        _logging.info(f"Best regularization via gridsearch: {best_reg:.4e}")
        if verbose:
            print(f"Best regularization via gridsearch: {best_reg:.4e}")

    # Bounded 1-D refinement in log10 space (host-driven, device-evaluated).
    # ONE frozen key for every objective evaluation: minimize_scalar needs
    # a deterministic objective (fresh draws per evaluation would jitter
    # the bracketing), and the 600-draw lambda-ladder study showed final
    # retention is FLAT across ten decades of lambda — the basin is wide
    # and the frozen-key choice does not bias the selection
    # (docs/ex1a_stability_study.md).
    refine_key = jax.random.fold_in(key, 0x5EED)

    def host_objective(logreg):
        return float(single(10.0**logreg, refine_key))

    opt = scipy.optimize.minimize_scalar(
        host_objective, method="bounded", bounds=np.log10(bounds)
    )
    if opt.success and opt.fun < MAXOPTVAL:
        chosen, refined = float(10.0**opt.x), True
        _logging.info(f"Best regularization via optimization: {chosen:.4e}")
        if verbose:
            print(f"Best regularization via optimization: {chosen:.4e}")
    else:
        if refine_failure == "raise":
            # PDEsMulti semantics: a failed refinement aborts the run
            # (``PDEsMulti/step3_estimate.py:207``).
            raise RuntimeError(
                "regularization refinement failed "
                f"(success={opt.success}, fun={opt.fun!r})"
            )
        chosen, refined = best_reg, False
        _logging.info("Regularization optimization failed; using grid best")
        if verbose:
            print("Optimization failed, falling back on gridsearch")

    return RegSearchResult(chosen, best_reg, grid_errors, refined)
