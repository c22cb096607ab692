from nanokappa_tpu.geometry.mesh import TriMesh
from nanokappa_tpu.geometry.primitives import make_primitive
from nanokappa_tpu.geometry.domain import Domain, BC, build_domain
from nanokappa_tpu.geometry.device import DeviceGeometry

__all__ = ["TriMesh", "make_primitive", "Domain", "BC", "build_domain", "DeviceGeometry"]
