"""HitLSLAM session orchestrator (host side).

The stateful shell around the device pipeline, mirroring the reference's
HitLSLAM class surface (HitLSLAM.h:18-34): init / Run / replayLog /
addCorrectionPoints / undo / getPoses / getCovariances / getWorldFrameScans /
getInputHistory — plus the same single-depth undo snapshot semantics
(HitLSLAM.cpp:262-276) and the pending-correction two-click state machine
(:151-216, keyed on the GUI modifier bitmask cast to CorrectionType).

Division of labor per the TPU-first design: the entire numeric cycle runs in
ONE fused device program (models/hitl/cycle.py); this class only holds state
handles, records history/undo snapshots, and manages the constraint-table
write cursor. The host reads back six scalars per correction.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ...core.state import (
    ConstraintTable,
    CorrectionType,
    MapState,
    SingleInput,
    make_map_state,
)
from ...solver.lm import LMConfig
from ...utils.timing import FunctionTimer
from .cycle import cycle_step


@dataclass
class CycleReport:
    """What happened in one Run()/replay cycle (observability surface)."""

    accepted: bool
    reason: str = ""
    points_verified: int = 0
    num_new_constraints: int = 0
    lm_iterations: int = 0
    initial_cost: float = 0.0
    final_cost: float = 0.0
    dropped_rows: int = 0   # constraint rows lost to a full table this cycle
    timings_ms: dict = field(default_factory=dict)


class HitLSLAM:
    """One interactive map-repair session."""

    def __init__(self, lm_config: LMConfig = LMConfig()):
        self.lm_config = lm_config
        self.state: MapState | None = None
        self.prev_poses = None
        self.prev_covariances = None
        self.prev_num_constraints = 0
        # True iff the snapshot in prev_* belongs to a post_optimize solve
        # (undo then reverts the refine without touching input_history)
        self._undo_is_refine = False
        self.num_constraints = 0
        self.input_history: list[SingleInput] = []
        self.num_completed_cycles = 0
        # pending-correction state machine
        self.selected_points: list[np.ndarray] = []
        self.pending_type = CorrectionType.UNKNOWN
        self.correction_type = CorrectionType.UNKNOWN
        # speculative dispatch: the fused cycle launched at selection-
        # complete time so the device computes during the human pause
        # between the last click and the 'p' keypress (VERDICT r2 item 4;
        # the reference's cycle is fully synchronous, HitLSLAM.cpp:379-484)
        self.speculate = True
        self.speculative_hits = 0
        self._speculative = None
        # optional [P-1, 3] per-factor odometry inverse stddevs: the EnML
        # loop-closure mode weights chain factors by the pose covariance
        # ellipses (AddLoopConstraint, vector_mapping.cpp:450-617) instead
        # of the HitL tool's hardcoded noise model
        self.odom_inv_sigma = None

    # -- lifecycle ---------------------------------------------------------

    def init(self, poses, covariances, point_clouds, normal_clouds,
             odometry=None, constraint_capacity: int = 8192):
        self.state = make_map_state(
            np.asarray(poses), np.asarray(covariances), point_clouds,
            normal_clouds, odometry=odometry,
            constraint_capacity=constraint_capacity,
        )
        self.prev_poses = self.state.poses
        self.prev_covariances = self.state.covariances

    def init_from_state(self, state: MapState):
        self.state = state
        self.prev_poses = state.poses
        self.prev_covariances = state.covariances

    # -- getters (reference API surface) -----------------------------------

    def get_poses(self) -> np.ndarray:
        return np.asarray(self.state.poses)

    def get_covariances(self) -> np.ndarray:
        return np.asarray(self.state.covariances)

    def get_world_frame_scans(self) -> np.ndarray:
        return np.asarray(self.state.world_points())

    def get_input_history(self) -> list[SingleInput]:
        return self.input_history

    # -- correction input state machine ------------------------------------

    def is_valid_correction_type(self, t: CorrectionType) -> bool:
        # POINT and CORNER are supported here (declared-but-unsupported in
        # the reference, human_constraints.h:8-16)
        return t in (
            CorrectionType.POINT, CorrectionType.LINE_SEGMENT,
            CorrectionType.CORNER, CorrectionType.COLINEAR,
            CorrectionType.PERPENDICULAR, CorrectionType.PARALLEL,
        )

    def add_correction_points(self, modifiers: int, mouse_down, mouse_up):
        """Two drags select the two segments; the modifier bitmask IS the
        correction type (HitLSLAM.cpp:151-216)."""
        ctype = (
            CorrectionType(modifiers)
            if modifiers in set(int(t) for t in CorrectionType)
            else CorrectionType.UNKNOWN
        )
        if ctype == CorrectionType.UNKNOWN:
            return
        mouse_down = np.asarray(mouse_down, np.float32)
        mouse_up = np.asarray(mouse_up, np.float32)
        if ctype != self.pending_type and self.is_valid_correction_type(ctype):
            # first drag of a new correction
            self.selected_points = [mouse_down]
            if ctype != CorrectionType.POINT:
                self.selected_points.append(mouse_up)
            self.pending_type = ctype
        else:
            # second drag completes the pair
            self.selected_points.append(mouse_down)
            if ctype != CorrectionType.POINT:
                self.selected_points.append(mouse_up)
            self.correction_type = ctype
            self.pending_type = CorrectionType.UNKNOWN
            self._dispatch_speculative()

    def _prepare_sel(self, ctype: CorrectionType,
                     sel: np.ndarray) -> np.ndarray | None:
        if ctype == CorrectionType.POINT and sel.shape[0] == 2:
            # a point pair enters the fused cycle as two degenerate segments
            sel = np.stack([sel[0], sel[0], sel[1], sel[1]])
        return sel if sel.shape[0] == 4 else None

    def _dispatch_speculative(self):
        """Launch the fused cycle for the just-completed selection WITHOUT
        blocking: the device solves during the human pause before the 'p'
        keypress, so run() only has to read the finished result. Safe by
        construction — run() reuses the dispatch only if the selection,
        poses, and constraint count are bit-identical; anything else falls
        back to a fresh dispatch.

        A background thread device_gets the report scalars immediately:
        measured on the axon relay, execution of a dispatched program is
        DEFERRED until a fetch forces it, and that force pays the ~30 ms
        per-program relay overhead no matter how long the host slept first.
        Prefetching from a side thread moves both the execution force and
        the scalar transfer into the human pause — a speculative-hit run()
        then completes in ~0.06 ms (vs ~35 ms fetching at keypress time)."""
        if not self.speculate or self.state is None:
            return
        sel = self._prepare_sel(self.correction_type,
                                np.stack(self.selected_points).astype(
                                    np.float32))
        if sel is None:
            return
        st = self.state
        # retire any superseded dispatch BEFORE launching the new one: the
        # relay serializes programs, so an in-flight stale prefetch would
        # contend with (and delay) the dispatch below
        self._discard_speculative()
        out = cycle_step(
            st.points, st.point_mask, st.poses, st.covariances,
            st.constraints,
            jnp.asarray(int(self.correction_type), jnp.int32),
            jnp.asarray(sel),
            jnp.asarray(self.num_constraints, jnp.int32),
            lm_config=self.lm_config,
            odom_inv_sigma=self.odom_inv_sigma,
        )
        box: dict = {}

        def prefetch(o=out, box=box):
            try:
                box["vals"] = jax.device_get((
                    o.verified, o.order_valid, o.num_new_constraints,
                    o.lm_iterations, o.lm_initial_cost, o.lm_final_cost,
                ))
            except Exception:   # leave box empty; run() refetches
                pass

        th = threading.Thread(target=prefetch, daemon=True,
                              name="hitl-speculative-prefetch")
        th.start()
        self._speculative = (int(self.correction_type), sel.tobytes(),
                             st.poses, self.num_constraints, out, th, box)

    def _discard_speculative(self):
        """Drop a pending speculative dispatch, waiting out its prefetch
        thread so stale device work is fully retired before new dispatches
        (the relay serializes programs; an unjoined fetch would contend)."""
        spec, self._speculative = self._speculative, None
        if spec is not None:
            spec[5].join()
        return spec

    def reset_correction_inputs(self):
        self.selected_points = []
        self.pending_type = CorrectionType.UNKNOWN
        self.correction_type = CorrectionType.UNKNOWN

    # -- undo --------------------------------------------------------------

    def undo(self) -> bool:
        """Single-depth undo (HitLSLAM.cpp:262-276): restore pose/covariance
        snapshot and deactivate the last correction's constraint rows.

        When the most recent solve was post_optimize (a net-new stage with
        no input-history entry), undo reverts THAT without touching the
        history — the last human correction stays undoable afterwards."""
        if self._undo_is_refine:
            st_r = self.state
            self.state = MapState(
                poses=self.prev_poses, covariances=self.prev_covariances,
                points=st_r.points, normals=st_r.normals,
                point_mask=st_r.point_mask, odometry=st_r.odometry,
                constraints=st_r.constraints,
            )
            self._undo_is_refine = False
            return True
        if not self.input_history:
            return False
        if self.input_history[-1].undone:
            return False
        st = self.state
        # deactivate rows added by the last cycle
        active = np.array(st.constraints.active)  # writable copy
        active[self.prev_num_constraints : self.num_constraints] = False
        table = ConstraintTable(
            ctype=st.constraints.ctype,
            constrained=st.constraints.constrained,
            anchor=st.constraints.anchor,
            delta_parallel=st.constraints.delta_parallel,
            delta_perpendicular=st.constraints.delta_perpendicular,
            delta_angle=st.constraints.delta_angle,
            penalty_dir=st.constraints.penalty_dir,
            active=jnp.asarray(active),
        )
        self.state = MapState(
            poses=self.prev_poses,
            covariances=self.prev_covariances,
            points=st.points, normals=st.normals, point_mask=st.point_mask,
            odometry=st.odometry, constraints=table,
        )
        self.num_constraints = self.prev_num_constraints
        self.input_history[-1].undone = 1
        return True

    # -- observability -----------------------------------------------------

    def get_cost_breakdown(self) -> dict:
        """Current odometry/human factor cost split at the present poses —
        the GetCeresCost analog (JointOptimization.cpp:342-344)."""
        import jax.numpy as jnp

        from ...ops import residuals as R
        from ...solver.joint import build_problem

        st = self.state
        prob = build_problem(st.poses, st.constraints,
                             odom_inv_sigma=self.odom_inv_sigma)
        r_o = R.odometry_residuals(prob.odom, st.poses)
        r_h = R.human_residuals(prob.human, st.poses)
        return {
            "odometry_cost": float(0.5 * jnp.sum(r_o * r_o)),
            "human_cost": float(0.5 * jnp.sum(r_h * r_h)),
            "num_active_constraints": int(jnp.sum(st.constraints.active)),
        }

    # -- auto-proposed corrections -------------------------------------------

    def propose_corrections(self, max_proposals: int = 3, **kw):
        """Loop-closure suggestions from the correlative scan matcher
        (models/hitl/propose.py); each proposal's .input runs through the
        ordinary replay_log path when accepted."""
        from .propose import propose_corrections

        return propose_corrections(self.state, max_proposals=max_proposals,
                                   **kw)

    # -- post-human STF refinement -----------------------------------------

    def post_optimize(self, max_iterations: int = 30,
                      matcher: str = "auto") -> CycleReport:
        """Run the STF correspondence + refinement solve on the current map
        (the reference's dormant PostHumanOptimization, made live).

        matcher="auto": try the global 1-NN grid first; if every bundle
        dies at the reference's >=10-per-pair gate (the fragmentation mode
        of heavily re-traversed maps, DEVIATIONS #20), rerun with the
        per-pair matcher. "global"/"pair" force one path."""
        from .refine import post_human_refine

        # retire any in-flight speculative prefetch (serialized relay)
        self._discard_speculative()
        st = self.state
        self.prev_poses = st.poses
        self.prev_covariances = st.covariances
        self.prev_num_constraints = self.num_constraints
        cfg = LMConfig(max_iterations=max_iterations)
        used = "pair" if matcher == "pair" else "global"
        out = post_human_refine(
            st.points, st.normals, st.point_mask, st.poses, st.constraints,
            config=cfg, matcher=used,
        )
        if matcher == "auto" and int(out.num_matches) == 0:
            used = "pair"
            out = post_human_refine(
                st.points, st.normals, st.point_mask, st.poses,
                st.constraints, config=cfg, matcher=used,
            )
        self.state = MapState(
            poses=out.poses, covariances=st.covariances,
            points=st.points, normals=st.normals, point_mask=st.point_mask,
            odometry=st.odometry, constraints=st.constraints,
        )
        # the prev_* snapshot now belongs to this refine: undo reverts it
        # without marking the last HUMAN input undone
        self._undo_is_refine = True
        # capacity diagnostics beyond lost rows surface in the reason text
        # (ADVICE r2 rule: capacity violations must be detectable)
        extra = ""
        for label, v in (("pairs_dropped", out.pairs_dropped),
                         ("vote_dropped", out.vote_dropped),
                         ("elect_dropped", out.elect_dropped)):
            if v is not None and int(v) > 0:
                extra += f", {label}={int(v)}"
        return CycleReport(
            True, reason=f"post-human STF refinement ({used} matcher{extra})",
            lm_iterations=int(out.iterations),
            initial_cost=float(out.initial_cost),
            final_cost=float(out.final_cost),
            # factor rows genuinely lost to matcher-table capacity
            dropped_rows=int(out.match_dropped),
        )

    # -- the correction cycle ----------------------------------------------

    def run(self) -> CycleReport:
        """Execute one full correction cycle from the pending user input
        (HitLSLAM::Run, HitLSLAM.cpp:379-484)."""
        if (
            not self.selected_points
            or self.pending_type != CorrectionType.UNKNOWN
        ):
            self.reset_correction_inputs()
            return CycleReport(False, "incomplete correction specification")
        sel = np.stack(self.selected_points).astype(np.float32)
        ctype = self.correction_type
        report = self._cycle(ctype, sel, record_history=True)
        self.reset_correction_inputs()
        return report

    def run_queue(self, inputs: list[SingleInput],
                  chain_capacity: int = 8,
                  record: bool = False) -> list[CycleReport]:
        """Execute queued corrections as fused device chains (serving mode).

        Each chunk of up to `chain_capacity` corrections runs as ONE device
        program (cycle.queue_chain) with a single host sync — the batch
        analog of the GUI's speculative dispatch, and the product form of
        the bench's pipelined-cycle headline (per-cycle dispatch costs more
        than the cycle itself through the TPU tunnel). Queues shorter than
        the chunk are padded with no-op cycles so one compiled program
        serves every length. Per-cycle accept/reject semantics (including
        non-finite-solve recovery) match sequential replay_log bit-for-bit;
        undo() restores the state before the WHOLE queue (the reference's
        single-depth snapshot, HitLSLAM.cpp:262-276)."""
        from .cycle import queue_chain

        if not inputs:
            return []
        # retire any in-flight speculative prefetch first: the relay
        # serializes programs and would stall the chain dispatches
        self._discard_speculative()
        st = self.state
        self.prev_poses = st.poses
        self.prev_covariances = st.covariances
        self.prev_num_constraints = self.num_constraints
        self._undo_is_refine = False
        reports: list[CycleReport] = []
        for lo in range(0, len(inputs), chain_capacity):
            chunk = inputs[lo:lo + chain_capacity]
            ctypes = np.zeros(chain_capacity, np.int32)
            sels = np.zeros((chain_capacity, 4, 2), np.float32)
            ctypes[:] = int(CorrectionType.COLINEAR)   # all-zero sel = no-op
            live = []
            for i, s in enumerate(chunk):
                sel_p = self._prepare_sel(s.correction_type,
                                          np.asarray(s.points, np.float32))
                if sel_p is None:
                    live.append(None)
                    continue
                ctypes[i] = int(s.correction_type)
                sels[i] = sel_p
                live.append(sel_p)
            st = self.state
            timer = FunctionTimer("queue")
            poses, covs, table, n_end, per = queue_chain(
                st.points, st.point_mask, st.poses, st.covariances,
                st.constraints, jnp.asarray(ctypes), jnp.asarray(sels),
                jnp.asarray(self.num_constraints, jnp.int32),
                lm_config=self.lm_config,
                odom_inv_sigma=self.odom_inv_sigma,
            )
            ok, ver, ordv, n_new, lm_it, c0, c1 = jax.device_get(per)
            timer.lap("queue_chain")
            for i, s in enumerate(chunk):
                self.num_completed_cycles += 1
                if live[i] is None:
                    reports.append(CycleReport(
                        False, "unsupported selection shape"))
                    continue
                diverged = bool(ver[i]) and bool(ordv[i]) and not bool(ok[i])
                if record and bool(ver[i]) and not diverged:
                    # parity with _cycle: verified inputs record even when
                    # order-rejected, but a DIVERGED solve records nothing
                    # (sequential replay returns before its record block)
                    self.input_history.append(
                        SingleInput(s.correction_type, 0, live[i].copy()))
                if not bool(ver[i]):
                    reports.append(CycleReport(
                        False, "input not verified near observations"))
                elif not bool(ordv[i]):
                    reports.append(CycleReport(
                        False, "selection overlap / no backprop window",
                        points_verified=4))
                elif not bool(ok[i]):
                    reports.append(CycleReport(
                        False, "solver diverged (non-finite cost); "
                        "state preserved"))
                else:
                    reports.append(CycleReport(
                        True, points_verified=4,
                        num_new_constraints=int(n_new[i]),
                        lm_iterations=int(lm_it[i]),
                        initial_cost=float(c0[i]),
                        final_cost=float(c1[i]),
                        timings_ms=timer.laps_ms()))
            self.num_constraints += int(np.sum(n_new))
            cap = st.constraints.capacity - 1
            if self.num_constraints > cap:
                import sys

                dropped = self.num_constraints - cap
                print(f"WARNING: constraint table full ({cap}); "
                      f"{dropped} rows dropped. "
                      f"Increase constraint_capacity.", file=sys.stderr)
                self.num_constraints = cap
            self.state = MapState(
                poses=poses, covariances=covs,
                points=st.points, normals=st.normals,
                point_mask=st.point_mask,
                odometry=st.odometry, constraints=table,
            )
        return reports

    def replay_log(self, logged: SingleInput,
                   record: bool = False) -> CycleReport:
        """Re-execute one logged correction (HitLSLAM::replayLog).

        `record=True` appends the input to the session history (used by the
        headless auto-repair loop so machine corrections are loggable and
        replayable exactly like human ones; plain log replay keeps the
        reference semantics of NOT re-recording)."""
        report = self._cycle(
            logged.correction_type,
            np.asarray(logged.points, np.float32),
            record_history=record,
        )
        self.reset_correction_inputs()
        return report

    def _cycle(self, ctype: CorrectionType, sel: np.ndarray,
               record_history: bool) -> CycleReport:
        st = self.state
        timer = FunctionTimer("cycle")
        sel_p = self._prepare_sel(ctype, sel)
        if sel_p is None:
            return CycleReport(False, f"unsupported selection shape {sel.shape}")
        sel = sel_p

        # snapshot for undo (device array handles — free, arrays immutable)
        prev_poses = st.poses
        prev_covariances = st.covariances
        prev_n = self.num_constraints

        # reuse the speculative dispatch when it matches this exact cycle
        # (selection bytes, pose array identity, constraint count) — the
        # device already did the work during the human pause, and the
        # prefetch thread already pulled the report scalars to the host
        out = vals = None
        spec = self._discard_speculative()
        if (spec is not None and spec[0] == int(ctype)
                and spec[1] == sel.astype(np.float32).tobytes()
                and spec[2] is st.poses
                and spec[3] == self.num_constraints):
            out = spec[4]
            vals = spec[6].get("vals")
            self.speculative_hits += 1
        if out is None:
            # ONE fused device program for the whole correction cycle
            out = cycle_step(
                st.points, st.point_mask, st.poses, st.covariances,
                st.constraints,
                jnp.asarray(int(ctype), jnp.int32),
                jnp.asarray(sel),
                jnp.asarray(self.num_constraints, jnp.int32),
                lm_config=self.lm_config,
                odom_inv_sigma=self.odom_inv_sigma,
            )
        if vals is None:
            vals = jax.device_get((
                out.verified, out.order_valid, out.num_new_constraints,
                out.lm_iterations, out.lm_initial_cost, out.lm_final_cost,
            ))
        verified, order_valid, n_new, lm_it, c0, c1 = vals
        timer.lap("cycle_step")
        self.num_completed_cycles += 1

        # failure detection / recovery: a non-finite solve leaves the session
        # state untouched (the reference exit(1)s on ceres::FAILURE,
        # JointOptimization.cpp:1123-1127 — we recover instead)
        if bool(order_valid) and bool(verified) and not np.isfinite(c1):
            return CycleReport(False, "solver diverged (non-finite cost); "
                               "state preserved",
                               timings_ms=timer.laps_ms())

        if not bool(verified):
            return CycleReport(False, "input not verified near observations",
                               timings_ms=timer.laps_ms())

        # the reference records history once the input verifies, even if the
        # ordering stage later rejects it (HitLSLAM.cpp:390-397), AND it
        # snapshots prev_poses_ before the ordering check (:390) — so an
        # undo() after an order-rejected input is a pose no-op that merely
        # marks the rejected entry undone. Match that: snapshot here, where
        # the state is still untouched.
        if record_history:
            self.input_history.append(SingleInput(ctype, 0, sel.copy()))
            self.prev_poses = prev_poses
            self.prev_covariances = prev_covariances
            self.prev_num_constraints = prev_n
            self._undo_is_refine = False

        if not bool(order_valid):
            return CycleReport(False, "selection overlap / no backprop window",
                               points_verified=4, timings_ms=timer.laps_ms())

        self.prev_poses = prev_poses
        self.prev_covariances = prev_covariances
        self.prev_num_constraints = prev_n
        self._undo_is_refine = False
        self.num_constraints += int(n_new)
        dropped = 0
        cap = st.constraints.capacity - 1
        if self.num_constraints > cap:
            # rows beyond capacity landed in the dump slot and were dropped
            import sys

            dropped = self.num_constraints - cap
            print(f"WARNING: constraint table full ({cap}); "
                  f"{dropped} rows dropped. "
                  f"Increase constraint_capacity.", file=sys.stderr)
            self.num_constraints = cap
        self.last_pre_solve_poses = out.pre_solve_poses
        self.state = MapState(
            poses=out.poses, covariances=out.covariances,
            points=st.points, normals=st.normals, point_mask=st.point_mask,
            odometry=st.odometry, constraints=out.constraints,
        )
        return CycleReport(
            True,
            points_verified=4,
            num_new_constraints=int(n_new),
            lm_iterations=int(lm_it),
            initial_cost=float(c0),
            final_cost=float(c1),
            dropped_rows=dropped,
            timings_ms=timer.laps_ms(),
        )
