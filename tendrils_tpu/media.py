"""Media inputs: video-frame feed and the optical-flow wrapper.

The reference uploads camera frames to GL textures and double-buffers them
for optical flow (`src/optical-flow/index.js:32-73`); here frames are numpy
arrays pushed from any source (camera client, video decoder, synthetic) and
the flow kernel is `ops.optical_flow`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .ops import optical_flow as of_ops


def image_to_grid(img, keep_u8=False):
    """`[H, W, 3|4]` uint8/float image (row 0 = top) -> engine grid
    `[4, H, W]` (row 0 = clip bottom).

    Returns a HOST (numpy) array: per-frame feeds hand it straight to the
    jitted frame dispatch, so the device transfer rides the dispatch
    instead of costing its own round-trip.

    `keep_u8=True` keeps a uint8 input as `u8[4, H, W]` — a quarter of the
    f32 upload bytes; the jitted frame converts to f32 ON DEVICE. The
    reference's per-frame video upload is its most expensive transfer too
    (`demo.main.js:1131-1160`), and it uploads u8 texels."""
    img = np.asarray(img)
    u8 = img.dtype == np.uint8 and keep_u8
    if img.dtype == np.uint8 and not keep_u8:
        img = img.astype(np.float32) / 255.0
    img = img[::-1]  # flip to the engine's bottom-up rows
    if img.shape[-1] == 3:
        alpha = (np.full_like(img[..., :1], 255) if u8
                 else np.ones_like(img[..., :1]))
        img = np.concatenate([img, alpha], axis=-1)
    return np.ascontiguousarray(np.moveaxis(img, -1, 0),
                                np.uint8 if u8 else np.float32)


def grid_to_image(grid):
    """Engine grid `f32[4, H, W]` -> `[H, W, 4]` float image, row 0 = top."""
    return np.moveaxis(np.asarray(grid), 0, -1)[::-1]


class OpticalFlow:
    """Double-buffered optical-flow source — ref `src/optical-flow/index.js`.

    `set_pixels(frame)` pushes the newest frame; `update(...)` computes the
    flow payload between the two buffered frames; `step()` rotates buffers.
    """

    def __init__(self, uniforms=None):
        self.uniforms = dict({
            "offset": 1.0, "lambda": 0.001, "speed": 1.0,
            "speedLimit": 1.0, "scaleUV": [1, -1],
        }, **(uniforms or {}))
        self.buffers = [None, None]

    def set_pixels(self, frame):
        """Upload the new frame into buffer 0 (`optical-flow/index.js:64-66`).

        `frame`: `[H, W, C]` image array or an engine grid `[4, H, W]`.
        The upload starts here (async) so the transfer overlaps the host's
        frame prep and the in-flight dispatch; the previous frame's device
        copy is reused from the ring (one upload per frame). uint8 frames
        STAY uint8 across the host→device transfer (4x fewer bytes; the
        jitted frame converts on device).
        """
        grid = (frame if (hasattr(frame, "shape") and len(frame.shape) == 3
                          and frame.shape[0] == 4)
                else image_to_grid(frame, keep_u8=True))
        grid = np.asarray(grid)
        if grid.dtype != np.uint8:
            grid = grid.astype(np.float32)
        # scaleUV mirrors the lookup (`optical-flow/index.frag:56`,
        # demo uses [-1, -1] for mirrored cameras) — realised as frame flips
        # relative to the default [1, -1].
        sx, sy = self.uniforms.get("scaleUV", [1, -1])
        if sx < 0:
            grid = grid[:, :, ::-1]
        if sy > 0:
            grid = grid[:, ::-1, :]
        if self.buffers[1] is None or self.buffers[1].shape != grid.shape \
                or self.buffers[1].dtype != grid.dtype:
            self.buffers[1] = jnp.zeros(grid.shape, grid.dtype)
        self.buffers[0] = jnp.asarray(np.ascontiguousarray(grid))
        return self

    def device_buffers(self):
        """(current, last) frames as DEVICE arrays (u8 or f32), converting
        lazily and caching the device copy in the ring — so each frame pays
        exactly one host→device transfer (the newly staged frame); the
        rotated previous frame reuses its upload."""
        self.buffers = [b if isinstance(b, jax.Array) else jnp.asarray(b)
                        for b in self.buffers]
        return self.buffers[0], self.buffers[1]

    def update(self, time, **overrides):
        """Compute the flow payload between current and last frames."""
        u = dict(self.uniforms, **overrides)
        cur, last = self.device_buffers()
        return of_ops.optical_flow(
            cur, last, time,
            offset=u["offset"], lambda_=u["lambda"], speed=u["speed"],
            speed_limit=u["speedLimit"])

    def step(self):
        """Rotate the frame ring — ref `optical-flow/index.js:59-61`."""
        self.buffers = [self.buffers[1], self.buffers[0]]
        return self

    def resize(self, shape_hw):
        c = 4
        h, w = shape_hw
        self.buffers = [jnp.zeros((c, h, w), jnp.float32) for _ in range(2)]
        return self
