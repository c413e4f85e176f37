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
  left/right  orbit phi (LMB x)      up/down   orbit theta (LMB y)
  +/-         zoom (RMB)             a/d w/x   pan look-at in XZ (MMB)
  space       recenter look-at (Space upstream)
  s           save PNG (S upstream)  escape    save and quit (Esc upstream)
Any camera change resets the accumulator (camchanged contract,
src/main.cpp:102-128).
"""

from __future__ import annotations

import logging

log = logging.getLogger("pathtracer.viewer")

PAN_STEP = 0.5  # world units per keypress (MMB drag analog)


def handle_key(renderer, key, original_look_at=None):
    """Apply one key binding to the renderer. Returns "save", "quit" or
    None. Pure of any GUI state so it tests headlessly."""
    if key == "left":
        renderer.orbit_camera(dphi=0.1)
    elif key == "right":
        renderer.orbit_camera(dphi=-0.1)
    elif key == "up":
        renderer.orbit_camera(dtheta=-0.1)
    elif key == "down":
        renderer.orbit_camera(dtheta=0.1)
    elif key in ("+", "="):
        renderer.orbit_camera(dzoom=-0.5)
    elif key == "-":
        renderer.orbit_camera(dzoom=0.5)
    elif key == "a":
        renderer.pan_camera(dx=-PAN_STEP)
    elif key == "d":
        renderer.pan_camera(dx=PAN_STEP)
    elif key == "w":
        renderer.pan_camera(dy=PAN_STEP)
    elif key == "x":
        renderer.pan_camera(dy=-PAN_STEP)
    elif key == " ":
        # Space restores the scene file's original lookAt
        # (src/main.cpp:159-164 resets to ogLookAt).
        la = (
            original_look_at
            if original_look_at is not None
            else renderer.scene.state.camera.look_at
        )
        renderer.orbit_camera(look_at=la)
    elif key == "s":
        return "save"
    elif key == "escape":
        return "quit"
    return None


def run_viewer(renderer, target_iterations: int, batch: int = 8,
               backend: str | None = None, max_frames: int | None = None):
    """Drive the interactive preview loop.

    backend: matplotlib backend override ("Agg" runs headless — used by
    the automated viewer test). max_frames bounds the loop for tests.
    """
    import matplotlib

    try:
        matplotlib.use(backend or "TkAgg")
    except Exception:
        pass
    import matplotlib.pyplot as plt

    original_look_at = renderer.scene.state.camera.look_at.copy()

    fig, ax = plt.subplots(figsize=(7, 7))
    if fig.canvas.manager is not None:
        try:
            fig.canvas.manager.set_window_title("tpu-pathtracer")
        except Exception:
            pass
    im = ax.imshow(renderer.frame_uint8()[:, ::-1, :])
    ax.axis("off")

    state = {"quit": False}

    def on_key(event):
        action = handle_key(renderer, event.key, original_look_at)
        if action in ("save", "quit"):
            path = renderer.save()
            log.info("saved %s", path)
        if action == "quit":
            state["quit"] = True

    fig.canvas.mpl_connect("key_press_event", on_key)
    interactive = backend != "Agg"
    if interactive:
        plt.ion()
        plt.show()

    frames = 0
    while not state["quit"] and renderer.iteration < target_iterations:
        renderer.step_batch(batch)
        im.set_data(renderer.frame_uint8()[:, ::-1, :])
        # window title shows iteration count (src/preview.cpp:176-177)
        ax.set_title(f"iteration {renderer.iteration}", fontsize=9)
        fig.canvas.draw_idle()
        if interactive:
            plt.pause(0.001)
        frames += 1
        if max_frames is not None and frames >= max_frames:
            break

    if renderer.iteration >= target_iterations:
        path = renderer.save()
        log.info("render complete, saved %s", path)
    if interactive:
        plt.ioff()
    plt.close(fig)
