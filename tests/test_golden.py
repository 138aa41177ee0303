"""Golden-trajectory tests (SURVEY §4): preset replay at the fixed timestep
is fully deterministic; these pin exact trajectories/statistics so semantic
regressions (force math, splat weights, preset values) are caught.

Golden values were produced by this implementation (the reference publishes
no numeric outputs to cite); they pin *our* semantics against drift.
Reference-anchored coverage lives elsewhere: `test_reference_oracle.py`
pins the GLSL primitives to the reference's algorithms, and
`test_preset_corridors.py` pins 60-frame preset-replay statistics with
multi-seed tolerance bands (no re-pin needed on recompilation).
"""

import hashlib

import numpy as np

from tendrils_tpu import EngineConfig, Tendrils
from tendrils_tpu.app import TendrilsDemo
from tendrils_tpu.ops import spawn


def _traj_digest(arr, decimals=4):
    q = np.round(np.asarray(arr, np.float64), decimals) + 0.0  # kill -0.0
    return hashlib.sha256(q.tobytes()).hexdigest()[:16]


def run_core(frames=10):
    eng = Tendrils(EngineConfig(root_num=32, view_res=(48, 64),
                                flow_samples=2, flow_rows=1, view_samples=2))
    eng.setup()
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.5, 0.01))
    for _ in range(frames):
        eng.frame()
    return eng


class TestGolden:
    def test_core_trajectory_stats(self):
        eng = run_core()
        p = np.asarray(eng.sim.particles, np.float64)
        # Statistical pins (robust to fp reassociation, catch semantics
        # drift): spawn disc + 10 steps of noise/flow forces.
        # NOTE: pinned values depend on the fractional-sine spawn hash,
        # whose f32 sin() rounding shifts under fusion changes — re-pin when
        # the spawn path's compilation structure changes intentionally.
        assert abs(p[0].mean() - (-0.011517)) < 1e-3
        assert abs(p[0].std() - 0.218106) < 2e-3
        assert abs(p[1].std() - 0.209863) < 2e-3
        speed = np.sqrt(p[2] ** 2 + p[3] ** 2)
        assert 0.001 < speed.mean() < 0.0025
        # Flow field got deposits and the trail rendered.
        flow = np.asarray(eng.sim.flow)
        assert 50 < (flow[3] > 1e-3).sum() < 3072
        view = np.asarray(eng.sim.view[0])
        assert view[3].max() > 0.1

    def test_replay_bit_exact(self):
        a = run_core(6)
        b = run_core(6)
        assert (_traj_digest(a.sim.particles)
                == _traj_digest(b.sim.particles))
        assert (_traj_digest(a.sim.view) == _traj_digest(b.sim.view))

    def test_preset_replay_deterministic_across_instances(self):
        def run():
            demo = TendrilsDemo({}, view_res=(36, 64), root_num=16,
                                flow_samples=2, flow_rows=1, view_samples=2)
            demo.apply_preset("Starlings")
            for _ in range(6):
                demo.render()
            return _traj_digest(demo.tendrils.sim.particles)

        assert run() == run()

    def test_timeline_replay_matches_seek(self):
        # Playing a timeline forwards lands on the same tweened values as
        # seeking straight to the time (calls aside) — replay consistency.
        from tendrils_tpu.animate import Player, frame

        def mk():
            return Player({"t": [frame({"x": 0.0, "y": 1.0}, 0.0),
                                 frame({"x": 10.0}, 100.0),
                                 frame({"x": 4.0, "y": 5.0}, 200.0)]},
                          {"t": {}})

        p1 = mk()
        for t in range(0, 160, 10):
            p1.play(float(t))
        p2 = mk()
        p2.seek(0.5)
        p2.play(150.0)
        assert abs(p1.outputs["t"]["x"] - p2.outputs["t"]["x"]) < 1e-9
