"""Spray-deposition simulation (stand-in for the proprietary simulator)."""
from .spray import (  # noqa: F401
    facevertex_thickness,
    simulate_program,
    simulate_spray,
    surface_centroid,
    write_thickness_csv,
)
