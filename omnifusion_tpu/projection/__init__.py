from omnifusion_tpu.projection.spec import (
    ProjectionSpec,
    Equi2PersGrids,
    Pers2EquiGrids,
    build_equi2pers_grids,
    build_pers2equi_grids,
)
from omnifusion_tpu.projection.ops import equi2pers, pers2equi
from omnifusion_tpu.projection.perspective import extract_views, insert_views

__all__ = [
    "ProjectionSpec",
    "Equi2PersGrids",
    "Pers2EquiGrids",
    "build_equi2pers_grids",
    "build_pers2equi_grids",
    "equi2pers",
    "pers2equi",
    "extract_views",
    "insert_views",
]
