"""Engine configuration.

Mirrors the semantics of the reference's config surface
(/root/reference/databricks/config.json and flood/utils/config.py:4-13:
environment variables take precedence over a JSON config file), re-expressed
as a typed dataclass.  Only the *analytical* constants are kept — storage
paths are caller concerns.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field, fields


@dataclass(frozen=True)
class EngineConfig:
    # Grid discipline (reference: config.json:26-27)
    resolution: float = 0.05          # grid cell size in degrees
    precision: int = 3                # decimals for float-key rounding

    # Region-of-interest slicing buffers (reference: config.json:28-29)
    buffer_div: float = 4.0
    buffer_mult: float = 2.0

    # Upstream-area mask threshold in m^2 (reference: config.json:30)
    upstream_threshold: float = 250_000_000.0

    # Return-period thresholds in years (reference: config.json:14)
    threshold_years: tuple = (2, 5, 20)

    # Closed categorical domains (reference: config.json:31-46)
    tendencies: dict = field(default_factory=lambda: {
        "increasing": "U", "stagnant": "C", "decreasing": "D"})
    intensities: dict = field(default_factory=lambda: {
        "purple": "P", "red": "R", "yellow": "Y", "gray": "G"})
    peak_timings: dict = field(default_factory=lambda: {
        "black_border": "BB", "grayed_color": "GC", "gray_border": "GB"})

    # Pipeline toggles (reference: config.json:47-48)
    use_first_as_control: bool = True
    use_control_member_in_ensemble: bool = True

    # Classification constants (reference: flood/spark/transforms.py:20-27,
    # 45-54, 74-78, 98-104)
    tendency_up_factor: float = 1.10
    tendency_down_factor: float = 0.90
    intensity_prob_threshold: float = 0.30
    peak_early_window: tuple = (1, 10)   # steps considered "start"
    peak_black_border_window: tuple = (1, 3)

    @property
    def half_grid_size(self) -> float:
        return self.resolution / 2.0

    @classmethod
    def load(cls, json_path: str | None = None, env_prefix: str = "FDS_") -> "EngineConfig":
        """env-then-JSON loading, same precedence as the reference's
        flood/utils/config.py:4-13 (os.getenv before json lookup)."""
        base: dict = {}
        if json_path and os.path.exists(json_path):
            with open(json_path) as f:
                base.update(json.load(f))
        out = {}
        for f_ in fields(cls):
            env_val = os.getenv(env_prefix + f_.name.upper())
            if env_val is not None:
                if f_.type in ("float",):
                    out[f_.name] = float(env_val)
                elif f_.type in ("int",):
                    out[f_.name] = int(env_val)
                elif f_.type in ("bool",):
                    out[f_.name] = env_val.lower() in ("1", "true", "yes")
                else:
                    out[f_.name] = json.loads(env_val)
            elif f_.name in base:
                out[f_.name] = base[f_.name]
        return cls(**out)


DEFAULT_CONFIG = EngineConfig()
