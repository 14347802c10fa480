"""Metric naming conventions (capability parity: reference utils/nomenclature.py)."""

from __future__ import annotations

import math
import random


def denote_pt(name: str, pt_min: float = 0.0) -> str:
    """Suffix a metric name with a pt threshold (e.g. ``_pt0.9``)."""
    if math.isclose(pt_min, 0.0):
        return name
    return f"{name}_pt{pt_min}"


_ADJECTIVES = (
    "swift", "quiet", "bright", "bold", "calm", "brisk", "deft", "keen",
    "lucid", "merry", "noble", "prime", "rapid", "solid", "vivid", "witty",
)
_NOUNS = (
    "falcon", "quark", "gluon", "pion", "meson", "tensor", "vertex", "sector",
    "barrel", "endcap", "pixel", "strip", "helix", "track", "lepton", "orbit",
)


def random_trial_name(rng: random.Random | None = None) -> str:
    """A short human-readable random run name (coolname-style)."""
    rng = rng or random.Random()
    return f"{rng.choice(_ADJECTIVES)}-{rng.choice(_NOUNS)}-{rng.randint(0, 999):03d}"


class Variable:
    """Registry entry mapping a variable name to display strings."""

    def __init__(self, name: str, latex: str = "", unit: str = ""):
        self.name = name
        self.latex = latex or name
        self.unit = unit

    @property
    def latex_with_unit(self) -> str:
        if self.unit:
            return f"{self.latex} [{self.unit}]"
        return self.latex


class VariableManager:
    """Latex/display-name registry for plot labels."""

    def __init__(self):
        self._vars: dict[str, Variable] = {}
        for name, latex, unit in [
            ("pt", r"$p_T$", "GeV"),
            ("eta", r"$\eta$", ""),
            ("phi", r"$\phi$", "rad"),
            ("r", "$r$", "mm"),
            ("z", "$z$", "mm"),
            ("double_majority", "double majority eff.", ""),
            ("perfect", "perfect match eff.", ""),
            ("lhc", "LHC match eff.", ""),
        ]:
            self.register(Variable(name, latex, unit))

    def register(self, var: Variable) -> None:
        self._vars[var.name] = var

    def __getitem__(self, name: str) -> Variable:
        return self._vars.get(name, Variable(name))


variable_manager = VariableManager()
