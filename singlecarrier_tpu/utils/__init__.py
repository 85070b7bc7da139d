from .compat import (device_complex, fetch, tree_fetch, czeros, cones,
                     enable_compilation_cache)

__all__ = ["device_complex", "fetch", "tree_fetch", "czeros", "cones",
           "enable_compilation_cache"]
