"""Interactive progressive preview — the GL window's capability substitute.

The reference blits a CUDA-written PBO into a GLFW window each frame
with orbit/zoom/pan mouse controls (/root/reference/src/preview.cpp,
src/main.cpp:149-205). There is no CUDA-GL-style zero-copy interop on
TPU (SURVEY.md §2 component 3 — deliberate capability substitution), so
the viewer fetches the tonemapped uint8 frame at display rate (NOT every
iteration — the reference's per-iteration D2H copy at
src/pathtrace.cu:389-390 is exactly what we avoid) and shows it with
matplotlib.

Controls — the reference's mouse bindings (src/main.cpp:168-205) plus
keyboard analogs (the tested headless contract):
  LMB drag    orbit phi/theta        RMB drag   zoom
  MMB drag    pan look-at in XZ
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


def handle_drag(renderer, button, dx_px, dy_px, size):
    """Apply one mouse-drag delta (pixels) to the renderer — the exact
    math of the reference's mousePositionCallback
    (/root/reference/src/main.cpp:174-205). button: 1=LMB orbit,
    2=MMB pan, 3=RMB zoom (matplotlib MouseButton values). size =
    (width, height) in pixels. Pure of GUI state so it tests
    headlessly; camera changes reset the accumulator via
    orbit_camera/pan_camera (camchanged contract)."""
    w, h = size
    if button == 1:
        # phi -= dx/width; theta -= dy/height (main.cpp:179-181)
        renderer.orbit_camera(dphi=-dx_px / w, dtheta=-dy_px / h)
    elif button == 3:
        # zoom += dy/height, clamped >= 0.1 in orbit_camera
        # (main.cpp:184-185)
        renderer.orbit_camera(dzoom=dy_px / h)
    elif button == 2:
        # lookAt -= dx*right*0.01; += dy*forward*0.01 with y-flattened
        # axes (main.cpp:188-200) — pan_camera's delta convention
        renderer.pan_camera(dx=0.01 * dx_px, dy=0.01 * dy_px)


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

    # mouse drags (LMB orbit / RMB zoom / MMB pan — main.cpp:168-205);
    # the displayed frame is x-flipped ([:, ::-1]), so screen-x deltas
    # negate to match the reference's world-space drag direction
    drag = {"button": None, "x": None, "y": None}

    def on_press(event):
        drag["button"] = getattr(event.button, "value", event.button)
        drag["x"], drag["y"] = event.x, event.y

    def on_release(event):
        drag["button"] = None

    def on_motion(event):
        if drag["button"] is None or event.x is None or event.y is None:
            return
        dx = event.x - (drag["x"] if drag["x"] is not None else event.x)
        # mpl canvas y grows upward; GLFW ypos grows downward
        dy = (drag["y"] if drag["y"] is not None else event.y) - event.y
        drag["x"], drag["y"] = event.x, event.y
        if dx == 0 and dy == 0:
            return
        w, hgt = fig.canvas.get_width_height()
        handle_drag(renderer, drag["button"], -dx, dy, (w, hgt))

    fig.canvas.mpl_connect("button_press_event", on_press)
    fig.canvas.mpl_connect("button_release_event", on_release)
    fig.canvas.mpl_connect("motion_notify_event", on_motion)
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
