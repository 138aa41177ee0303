"""Application layer (SURVEY §2.8): the headless demo app, preset library,
keyboard performance map and the scroll-embed sequencer."""

from .demo import TendrilsDemo, tendrils_demo
from .presets import PRESETS

__all__ = ["PRESETS", "TendrilsDemo", "tendrils_demo"]
