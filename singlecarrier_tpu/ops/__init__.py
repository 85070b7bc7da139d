from .frontend_pallas import fused_frontend, frontend_reference

__all__ = ["fused_frontend", "frontend_reference"]
