"""Named sim configurations (the framework's "model zoo").

Mirrors BASELINE.md's five benchmark configs and the reference's quality
tiers. `build(name)` returns a spawned, ready-to-step engine; heavy configs
default to the Pallas backends on TPU.
"""

import jax

from ..engine import EngineConfig, Tendrils
from ..spawners import spawn_ball


def _backends():
    on_tpu = jax.default_backend() == "tpu"
    b = "pallas" if on_tpu else "xla"
    return {"splat_backend": b, "gather_backend": b,
            "flow_samples": 2, "flow_rows": 1, "view_samples": 2}


def _spawned(cfg, radius=0.6, speed=0.01):
    eng = Tendrils(cfg)
    eng.setup()
    spawn_ball(radius=radius, speed=speed).spawn(eng)
    return eng


def default_preview(view_res=(360, 640)):
    """BASELINE config 1 family: 256² particles, light preview."""
    return _spawned(EngineConfig(root_num=256, view_res=view_res,
                                 **_backends()))


def one_m_flow(view_res=(1080, 1920)):
    """BASELINE config 2: 1M particles, flow feedback + 1080p trail."""
    return _spawned(EngineConfig(root_num=1024, view_res=view_res,
                                 **_backends()))


def respawn_stress_4m(view_res=(1080, 1920)):
    """BASELINE config 3: 4M particles (respawn stress driven by caller)."""
    return _spawned(EngineConfig(root_num=2048, view_res=view_res,
                                 **_backends()))


def optical_flow_driven(view_res=(720, 1280)):
    """BASELINE config 4: camera-flow-driven 512² sim (feed frames via
    `media.OpticalFlow` + `engine.composite_flow`)."""
    return _spawned(EngineConfig(root_num=512, view_res=view_res,
                                 **_backends()))


def live_show_16m(view_res=(2160, 3840)):
    """BASELINE config 5 / north star: 16.7M particles, 4K trail buffer."""
    return _spawned(EngineConfig(root_num=4096, view_res=view_res,
                                 **_backends()))


def quality_tier(level, view_res=(1080, 1920)):
    """The reference's quality tiers — ref `demo.main.js:978-1009`:
    rootNum × {1, 2, 4} with damping nudged down per tier."""
    from ..state import default_state
    d = default_state()
    root = d["rootNum"] * (2 ** level)
    eng = _spawned(EngineConfig(root_num=root, view_res=view_res,
                                **_backends()))
    eng.state["damping"] = d["damping"] - 1e-3 * level
    return eng


MODELS = {
    "default-preview": default_preview,
    "1m-flow": one_m_flow,
    "4m-respawn-stress": respawn_stress_4m,
    "optical-flow-driven": optical_flow_driven,
    "16m-live-show": live_show_16m,
}


def build(name, **kw):
    """Build a named model configuration."""
    return MODELS[name](**kw)
