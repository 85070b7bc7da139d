from .compat import device_complex, fetch, tree_fetch, czeros, cones

__all__ = ["device_complex", "fetch", "tree_fetch", "czeros", "cones"]
