"""Config-4 tunnel-floor demonstration (VERDICT r2 #4).

Measures, through the axon tunnel:
  a) empty-dispatch roundtrip (tiny jitted op, result fetched)
  b) dispatch + 0.9 MB u8 upload (the camera frame)
  c) the full config-4 interactive frame (upload + step_draw_io)
If (c) is within ~20% of (a)+(upload amortisation), the frame is at the
transport floor and further code work cannot move it on this link.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, n=20):
    fn()  # warm
    t0 = time.time()
    for _ in range(n):
        fn()
    return (time.time() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from tendrils_tpu.media import OpticalFlow

    one = jnp.ones((8, 128))
    f = jax.jit(lambda x: x * 1.000001)

    def empty_dispatch():
        float(f(one)[0, 0])

    print(f"a) empty dispatch+fetch: {timed(empty_dispatch):.1f} ms",
          flush=True)

    img = np.zeros((480, 640, 3), np.uint8)

    def upload():
        x = jax.device_put(img)
        float(f(one)[0, 0])  # fence behind the upload
        del x

    print(f"b) 0.9MB u8 upload + dispatch: {timed(upload):.1f} ms",
          flush=True)

    eng = bench._engine(512, (720, 1280), True)
    of = OpticalFlow({"offset": 0.05, "speed": 0.08})
    of_uniforms = {"offset": 0.05, "speed": 0.08}
    i = [0]

    def of_frame():
        i[0] += 1
        im = np.zeros((480, 640, 3), np.uint8)
        im[:, (i[0] * 8) % 600:(i[0] * 8) % 600 + 40] = 255
        of.set_pixels(im)
        eng.timer.tick()
        eng.step_draw_io(of_frames=of.device_buffers(),
                         of_uniforms=of_uniforms)
        of.step()

    of_frame()
    of_frame()
    float(eng.sim.particles[0, 0])
    t0 = time.time()
    n = 20
    for _ in range(n):
        of_frame()
    float(eng.sim.particles[0, 0])
    ms = (time.time() - t0) / n * 1e3
    print(f"c) config-4 frame: {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
