"""Solver options.

Reference-parity option names (Altro.jl ``SolverOptions`` as used in the
reference's examples: ``cost_tolerance_intermediate``, ``penalty_scaling``,
``penalty_initial`` — examples/Cartpole.ipynb, examples/Quadrotor.ipynb;
nested docs at /root/reference/docs/old/solving.md).

This is a plain frozen dataclass of Python scalars: options are trace-time
constants (the TPU analog of the reference's type-level dispatch on options),
so changing an option re-specializes the compiled solver.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

__all__ = ["SolverOptions"]


@dataclasses.dataclass(frozen=True)
class SolverOptions:
    # -- termination ----------------------------------------------------------
    cost_tolerance: float = 1e-4
    cost_tolerance_intermediate: float = 1e-4
    gradient_tolerance: float = 1e-5
    gradient_tolerance_intermediate: float = 1e-5
    constraint_tolerance: float = 1e-6
    iterations: int = 300          # total inner (iLQR) iteration cap
    iterations_outer: int = 30     # AL dual/penalty updates
    iterations_inner: int = 100    # iLQR iterations per AL step
    dJ_counter_limit: int = 10     # consecutive zero-progress iLQR iterations

    # -- augmented Lagrangian (docs/old/solving.md; Cartpole/Quadrotor.ipynb)
    penalty_initial: float = 1.0
    penalty_scaling: float = 10.0
    penalty_max: float = 1e8
    dual_max: float = 1e8
    # Conditional (Bertsekas) penalty update: scale mu only when the max
    # violation failed to drop by this factor, so mu stays as small as the
    # dual updates allow — at huge mu the iLQR quadratic model degrades on
    # unstable dynamics and the inner solver stalls.
    penalty_conditional: bool = True
    penalty_conditional_ratio: float = 0.25
    # Divergence safeguard (outer-iterate rejection): an inner solve that
    # descends a weakly-penalized AL merit can wedge at an iterate far
    # outside the constraint set; duals/penalties updated there are garbage
    # no later outer iteration recovers from.  When the max violation
    # exceeds  max(al_reject_ratio * best_viol_so_far, al_reject_floor)
    # the outer step is REJECTED: keep the previous accepted iterate and
    # the old duals, force a penalty escalation.  The solve also returns a
    # Pareto-dominating earlier iterate if the final one is infeasible and
    # worse in both violation and cost.
    # ``al_reject_floor`` is an absolute violation ceiling (problem units)
    # marking "clearly diverged" — it only matters for feasible starts
    # (best_viol ~ 0), where any plausible AL excursion stays far below it.
    # It does NOT auto-scale: on problems whose constraints naturally read
    # in large units (forces of O(100), say) a legitimate first excursion
    # can cross 10 — raise the floor toward ~0.1x the largest plausible
    # constraint magnitude for such problems (ADVICE r3; docs/solvers.md).
    al_safeguard: bool = True
    al_reject_ratio: float = 25.0
    al_reject_floor: float = 10.0

    # -- dynamics Jacobians ---------------------------------------------------
    # "exact": jacfwd through the full integrator (RK4 chain) — the
    # reference's ForwardAD behavior.  "approx": one linearization of the
    # CONTINUOUS dynamics per knot, exponentiated to 2nd order
    # (A = I + dt Af + dt^2/2 Af^2) — ~4x less compute/bandwidth; iLQR is
    # Gauss-Newton, so approximate Jacobians trade convergence rate, not
    # solution accuracy (the forward rollout stays exact).
    # "approx1" is the first-order (Euler) variant A = I + dt Af, B = dt Bf:
    # skips the O(dt^2) correction's batched tiny einsums, which measure
    # ~30% of a 1-iteration RTI MPC step on TPU at B=2048 for no quality
    # change on warm-started re-solves.
    # "chain" assembles the same exact Jacobians via the integrator chain
    # rule from analytic dynamics_jacobian overrides — machine-precision
    # equivalent to "exact", preferred on CPU/f64 where closed forms exist
    # (on TPU the stage-chain's tiny matmuls are ~23x slower than jacfwd).
    # "analytic1"/"analytic2": like approx1/approx but the continuous
    # (Af, Bf) come from Model.dynamics_jacobian_batch — a batched
    # SCATTER-FREE closed-form assembly — instead of jacfwd; skips the
    # tangent-intermediate HBM traffic that dominates the RTI MPC step.
    jacobian_mode: str = "exact"
    # Dtype for the approx/approx1 jacfwd tangents: "same" (trajectory
    # dtype) or "bfloat16" (half-bandwidth tangent intermediates; the
    # discrete A, B come back in the trajectory dtype).
    linearize_dtype: str = "same"

    # -- Riccati backward pass ------------------------------------------------
    # "sequential": lax.scan recursion.  "parallel": associative-scan
    # parallel-in-time Riccati (O(log N) depth — the long-horizon/knot-axis
    # parallelism, SURVEY.md §5; exact match to sequential at rho = 0).
    riccati: str = "sequential"
    # Algebra inside the sequential recursion: "matmul" (tiny dot_generals)
    # or "mulsum" (broadcast-multiply+reduce — with large vmapped batches
    # XLA lays the scan inputs out batch-minor, where per-knot dot_generals
    # force per-step relayouts; the mulsum form measured 99 -> 15
    # ms/iteration at B=2048 on v5e, 2026-08-21).  Full-step A/B on the
    # flagship bench: RTI 38,440 -> 122,022 solves/s and cold 169 -> 301
    # solves/s, identical results (f64 CPU check: max|du| ~ 1e-13).
    # CPU f64 solves read ~9% slower — the TPU-first default stands.
    riccati_body: str = "mulsum"

    # -- AL expansion order ---------------------------------------------------
    # False (default): Gauss-Newton AL Hessian mu J' dPi'dPi J.  True: add
    # the exact curvature terms (cones.projection_hessian +
    # constraints.constraint_hessian) — full-Newton AL, can be indefinite
    # (handled by bp regularization), slower per iteration.
    al_hessian_exact: bool = False

    # -- backward-pass regularization ----------------------------------------
    # (Altro's bp_reg_fail_limit has no analog here: the backward pass never
    # retries in place — see ilqr._backward_pass — so failure is declared
    # when rho saturates at bp_reg_max, not by counting retries.)
    bp_reg_initial: float = 0.0
    bp_reg_increase_factor: float = 1.6
    bp_reg_min: float = 1e-8
    bp_reg_max: float = 1e8

    # -- forward line search --------------------------------------------------
    # (Altro's line_search_decrease_factor has no analog: the parallel line
    # search derives its geometric alpha schedule from iterations_linesearch
    # and line_search_min_alpha instead of a sequential halving factor.)
    line_search_lower_bound: float = 1e-8
    line_search_upper_bound: float = 10.0
    line_search_min_alpha: float = 1e-6
    # Number of parallel line-search step sizes; 0 = unconditional full
    # Newton step (real-time-iteration mode, fixed-schedule solver only —
    # skips the acceptance test AND both AL cost evaluations).
    iterations_linesearch: int = 16

    # -- safeguards -----------------------------------------------------------
    # ``max_cost_value`` bounds the AL MERIT (objective + penalty), not the
    # bare objective (the reference's semantics): with penalty_max ~ 1e8 a
    # badly-scaled infeasible cold start (||c|| of O(1e2)) can legitimately
    # carry a merit above 1e12 — raise this for large-scale problems with
    # distant infeasible starts or every trial step gets rejected and the
    # inner loop stalls until the outer safeguard fires (ADVICE r3).
    max_cost_value: float = 1e12
    max_state_value: float = 1e12

    # Report the TRUE (un-augmented) objective cost in ALSolution.J from
    # fixed-schedule steps.  When False, J carries the AL-augmented cost the
    # line search already computed (equal to the true cost when duals have
    # converged and violations are ~0) and the step skips one full objective
    # evaluation — for RTI MPC loops that steer on violation, not cost.
    record_final_cost: bool = True

    # -- stats recording --------------------------------------------------------
    # Record the per-outer-iteration SolveStats history in the solution.
    # Disable when the solution pytree is carried through a jitted loop whose
    # other producers return stats=None (structure stability avoids retraces)
    # or to shave the (O,)-array carry in huge batches.
    record_stats: bool = True

    # -- final polish ---------------------------------------------------------
    # Run one more inner solve at the tight tolerance with converged duals
    # after the AL loop (Altro behavior).  Disable for fixed-budget MPC
    # steps: under vmap the polish runs at the batch straggler's pace.
    final_polish: bool = True

    # -- infeasible start (ALTRO slack augmentation) --------------------------
    infeasible: bool = False
    slack_penalty: float = 1.0     # R weight on the slack defect controls

    # -- Lie-group error-state expansions (RobotDynamics errstate role) ------
    # When True and the model defines a reduced error state (e.g. quaternion
    # models, errstate_dim < n), the Riccati pass runs in tangent-space
    # coordinates (abstract_constraint.jl:282-303 applied to the full
    # expansion) — Altro's default behavior for RigidBody models.  Models
    # with errstate_dim == n are unaffected.
    error_state: bool = True
    # Implementation of the structured error-state transform (TPU A/B knob,
    # VERDICT r4 #3): "concat" = static slice concats + tiny einsums;
    # "mulsum" = same structure with broadcast-multiply+reduce instead of
    # einsum (dot_general materializes its operands in the padded
    # (8, 128)-tiled layout — ~8-40x the logical bytes for these tiny
    # dims; mult+reduce stays inside XLA loop fusions); "dense_ms" = one
    # dense (k, n, nt) E tensor applied with mult+reduce.
    # Measured (v5e, B=2048 quadrotor RTI, BENCH_ES=1, 2026-08-21):
    # mulsum 35823 solves/s vs concat 16637 vs dense_ms 32452 — the
    # einsum path's dot_general operand materializations were 75% of the
    # error-state workload's step time.  All three are bit-identical in
    # f64 (CPU check) and within f32 reassociation noise on TPU.
    errstate_impl: str = "mulsum"

    # -- projected-Newton solution polish (ALTRO phase 2) --------------------
    # Default ON: phase 2 is integral to ALTRO (docs/old/solvers.md; the
    # IROS-2019 algorithm) — AL characteristically stalls at ~1e-4..1e-6
    # violation once penalties saturate, and the active-set Newton
    # projection is what reaches tight feasibility from there.  It may
    # also CONFIRM convergence of a stalled-but-near-feasible AL phase
    # (altro.altro_solve "rescue").  Fixed-schedule RTI MPC steps never
    # run it (solvers/fixed.py has no polish phase).
    projected_newton: bool = True
    # inequality rows within this distance of the boundary are HELD by the
    # projection (chatter guard; solvers/projection.py)
    projected_newton_tolerance: float = 1e-3
    # Newton passes; larger problems need more (N=401 Dubins reaches 1e-13
    # at 8, tests/test_solve.py)
    projected_newton_iterations: int = 3
    # AL-phase exit tolerance when the PN phase is on (Altro.jl's
    # historical projected_newton_tolerance semantics: the AL loop runs to
    # this LOOSER violation and Newton closes the rest).  None = run the
    # AL phase to constraint_tolerance (the conservative default).  The AL
    # phase's iterations buy feasibility digits Newton gets nearly free:
    # the TPU cold bench measured 2.7x throughput at 65x tighter final
    # feasibility and identical cost with 1e-1 (CLAUDE.md, bench.py
    # BENCH_COLD_ALTOL sweep).  Tune per problem: stopping the dual
    # iteration early can leave the cost marginally suboptimal (~0.1% on
    # the Dubins park at 1e-3), and too loose a value hands PN an iterate
    # whose active set is wrong (1e-1 fails to converge there) — the PN
    # keep-guard then returns the AL iterate unconverged rather than a
    # corrupted one.
    al_phase_tolerance: Optional[float] = None

    # -- warm-start hygiene ---------------------------------------------------
    # Max per-step dynamics defect for a warm-start state trajectory
    # (al_solve xs_init) to be trusted as the initial ITERATE.  Beyond it
    # the solve falls back to the rollout of the warm-start controls:
    # a dynamically-inconsistent xs_init is constraint-feasible and
    # artificially cheap, and the best-iterate backstop could return it
    # as "converged" (r5 DIRCOL-warm-start incident).  Shifted MPC
    # trajectories and projected-Newton outputs have defects orders of
    # magnitude below this; use opts.infeasible for genuine state seeding.
    warm_start_defect_tolerance: float = 1e-2

    def __post_init__(self):
        # Enum-style knobs fail loudly on typos ("bf16" silently behaving as
        # "same" would let an A/B run measure the baseline while believing it
        # measured half-width tangents — ADVICE r4).
        _check("linearize_dtype", self.linearize_dtype, ("same", "bfloat16"))
        _check("jacobian_mode", self.jacobian_mode,
               ("exact", "approx", "approx1", "chain", "analytic1", "analytic2"))
        _check("riccati", self.riccati, ("sequential", "parallel"))
        _check("errstate_impl", self.errstate_impl,
               ("concat", "mulsum", "dense_ms"))
        _check("riccati_body", self.riccati_body, ("matmul", "mulsum"))

    def replace(self, **kw) -> "SolverOptions":
        return dataclasses.replace(self, **kw)


def _check(name, value, allowed):
    if value not in allowed:
        raise ValueError(f"SolverOptions.{name}={value!r}; expected one of {allowed}")
