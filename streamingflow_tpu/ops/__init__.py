from .lift_splat import (bev_pool, projection_to_birds_eye_view,
                       quantize_geometry, warp_geometry_to_present)
