from .mesh import make_mesh, sharded_score_fn, sharded_verify
