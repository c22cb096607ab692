from nanokappa_tpu.material.tables import Material, MaterialTables
from nanokappa_tpu.material.loader import load_material
from nanokappa_tpu.material.synthetic import synthetic_material, write_synthetic_hdf5

__all__ = [
    "Material",
    "MaterialTables",
    "load_material",
    "synthetic_material",
    "write_synthetic_hdf5",
]
