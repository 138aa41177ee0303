"""Model zoo — named, ready-to-run sim configurations.

For a particle-visuals framework the "model families" are the benchmark and
show configurations (BASELINE.md configs, the reference's quality tiers
`demo.main.js:978-1009`, and the preset families). Each entry builds a
configured engine (or demo app) in one call.
"""

from .configs import (MODELS, build, default_preview, live_show_16m,
                      one_m_flow, optical_flow_driven, quality_tier,
                      respawn_stress_4m)

__all__ = ["MODELS", "build", "default_preview", "live_show_16m",
           "one_m_flow", "optical_flow_driven", "quality_tier",
           "respawn_stress_4m"]
