"""Model families matching the reference's example problems (SURVEY.md §2a
"Examples / experiment scripts"; BASELINE.json configs 1-5)."""

from collocfem_tpu.models.vdp import VanDerPol
from collocfem_tpu.models.duffing import Duffing
from collocfem_tpu.models.pendulum import Pendulum
from collocfem_tpu.models.aircraft import AircraftLongitudinal

__all__ = ["VanDerPol", "Duffing", "Pendulum", "AircraftLongitudinal"]
