"""Long-Term Vector Mapping — the SDF map curator."""

from .curator import CuratorParams, LongTermVectorMap, MappingVector  # noqa: F401
