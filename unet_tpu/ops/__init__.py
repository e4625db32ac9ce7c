"""On-device image/mask op library.

Every OpenCV call in the reference pipeline has a JAX counterpart here so the
whole two-stage pipeline can run inside one jit program:

  reference (host OpenCV)                      unet_tpu (device XLA)
  -----------------------                      ---------------------
  cv2.resize INTER_LINEAR/INTER_NEAREST        ops.image.resize_bilinear / resize_nearest
  cv2.rotate ROTATE_90_*                       ops.image.rotate90_ccw / rotate90_cw
  cv2.GaussianBlur / filter2D sharpen          ops.image.gaussian_blur / sharpen
  cv2.cvtColor BGR2GRAY/BGR2RGB/BGR2LAB        ops.color.*
  cv2.dilate / erode / morphologyEx            ops.morph.dilate / erode / open_ / close_
  cv2.Canny / Sobel / Laplacian / DoG          ops.edges.canny / sobel / laplacian / dog
  cv2.connectedComponentsWithStats             ops.cc.connected_components / component_stats
  cv2.createCLAHE                              ops.clahe.clahe
  cv2.distanceTransform band tests             ops.morph.ring_band
  per-row width loops (geometry)               ops.geometry.width_per_row / diameter_metrics
  numpy metric loops                           ops.seg_metrics.confusion_matrix
"""

from unet_tpu.ops import color, image, morph, edges, cc, clahe, geometry, seg_metrics, frames  # noqa: F401
