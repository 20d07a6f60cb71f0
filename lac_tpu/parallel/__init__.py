from .mesh import make_mesh, plan_group_sharded

__all__ = ["make_mesh", "plan_group_sharded"]
