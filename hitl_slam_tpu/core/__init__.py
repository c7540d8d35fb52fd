"""Core data model."""

from .state import (  # noqa: F401
    ConstraintTable,
    CorrectionType,
    MapState,
    SingleInput,
    make_map_state,
)
