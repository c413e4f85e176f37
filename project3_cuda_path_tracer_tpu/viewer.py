"""Interactive progressive preview — the GL window's capability substitute.

The reference blits a CUDA-written PBO into a GLFW window each frame
with orbit/zoom/pan mouse controls (/root/reference/src/preview.cpp,
src/main.cpp:149-205). There is no CUDA-GL-style zero-copy interop on
TPU (SURVEY.md §2 component 3 — deliberate capability substitution), so
the viewer fetches the tonemapped uint8 frame at display rate (NOT every
iteration — the reference's per-iteration D2H copy at
src/pathtrace.cu:389-390 is exactly what we avoid) and shows it with
matplotlib.

Controls (keyboard analogs of the reference's mouse bindings):
  left/right  orbit phi        up/down   orbit theta
  +/-         zoom             space     recenter look-at (Space upstream)
  s           save PNG (S upstream)      escape    save and quit (Esc upstream)
Any camera change resets the accumulator (camchanged contract,
src/main.cpp:102-128).
"""

from __future__ import annotations

import logging

log = logging.getLogger("pathtracer.viewer")


def run_viewer(renderer, target_iterations: int, batch: int = 8):
    import matplotlib

    try:
        matplotlib.use("TkAgg")
    except Exception:
        pass
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 7))
    fig.canvas.manager.set_window_title("tpu-pathtracer")
    im = ax.imshow(renderer.frame_uint8()[:, ::-1, :])
    ax.axis("off")

    state = {"quit": False}

    def on_key(event):
        k = event.key
        if k == "left":
            renderer.orbit_camera(dphi=0.1)
        elif k == "right":
            renderer.orbit_camera(dphi=-0.1)
        elif k == "up":
            renderer.orbit_camera(dtheta=-0.1)
        elif k == "down":
            renderer.orbit_camera(dtheta=0.1)
        elif k in ("+", "="):
            renderer.orbit_camera(dzoom=-0.5)
        elif k == "-":
            renderer.orbit_camera(dzoom=0.5)
        elif k == " ":
            renderer.orbit_camera(look_at=renderer.scene.state.camera.look_at)
        elif k == "s":
            path = renderer.save()
            log.info("saved %s", path)
        elif k == "escape":
            path = renderer.save()
            log.info("saved %s", path)
            state["quit"] = True

    fig.canvas.mpl_connect("key_press_event", on_key)
    plt.ion()
    plt.show()

    while not state["quit"] and renderer.iteration < target_iterations:
        renderer.step_batch(batch)
        im.set_data(renderer.frame_uint8()[:, ::-1, :])
        # window title shows iteration count (src/preview.cpp:176-177)
        ax.set_title(f"iteration {renderer.iteration}", fontsize=9)
        fig.canvas.draw_idle()
        plt.pause(0.001)

    if renderer.iteration >= target_iterations:
        path = renderer.save()
        log.info("render complete, saved %s", path)
    plt.ioff()
