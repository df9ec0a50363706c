# Motion models: homography, WarpField (mesh warp), and their estimators
# (batched RANSAC, on-device mesh least-squares) live under vision/.
from livevisionkit_tpu.models.homography import Homography
from livevisionkit_tpu.models.warp_field import WarpField

__all__ = ["Homography", "WarpField"]
