from edgestyle_tpu.core.dtypes import DTypePolicy, default_policy
from edgestyle_tpu.core.mesh import MeshSpec, make_mesh, batch_sharding, replicated
from edgestyle_tpu.core import porting
