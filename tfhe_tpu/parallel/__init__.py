from .mesh import make_mesh, sharded_gate2, sharded_bootstrap_step
