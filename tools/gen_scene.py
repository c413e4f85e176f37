"""Generate the many-light many-material stress scene (BASELINE config 5):
1920x1080, a grid of spheres cycling through N materials (diffuse /
mirror / glass / glossy-mix / emissive), exercising material sort +
per-bounce compaction at scale.

  python tools/gen_scene.py scenes/many_materials.txt
"""

from __future__ import annotations

import sys


def emit(path: str, grid_x: int = 8, grid_y: int = 4, n_materials: int = 32):
    lines = []
    rng_colors = [
        (0.9, 0.3, 0.3), (0.3, 0.9, 0.3), (0.3, 0.3, 0.9), (0.9, 0.9, 0.3),
        (0.9, 0.3, 0.9), (0.3, 0.9, 0.9), (0.8, 0.6, 0.4), (0.6, 0.4, 0.8),
    ]

    def material(i: int) -> str:
        c = rng_colors[i % len(rng_colors)]
        # ids 0-3 are reserved room materials; the grid cycles kinds above
        if i == 0:
            # big key light
            return (
                f"MATERIAL {i}\nRGB 1 1 1\nSPECEX 0\nSPECRGB 0 0 0\n"
                f"REFL 0\nREFR 0\nREFRIOR 0\nEMITTANCE 6\n"
            )
        if i == 1:  # white diffuse (floor/ceiling/back)
            return (
                f"MATERIAL {i}\nRGB .95 .95 .95\nSPECEX 0\nSPECRGB 0 0 0\n"
                f"REFL 0\nREFR 0\nREFRIOR 0\nEMITTANCE 0\n"
            )
        if i == 2:  # red diffuse (left wall)
            return (
                f"MATERIAL {i}\nRGB .8 .3 .3\nSPECEX 0\nSPECRGB 0 0 0\n"
                f"REFL 0\nREFR 0\nREFRIOR 0\nEMITTANCE 0\n"
            )
        if i == 3:  # green diffuse (right wall)
            return (
                f"MATERIAL {i}\nRGB .3 .8 .3\nSPECEX 0\nSPECRGB 0 0 0\n"
                f"REFL 0\nREFR 0\nREFRIOR 0\nEMITTANCE 0\n"
            )
        kind = (i - 4) % 4
        if kind == 1:  # mirror
            return (
                f"MATERIAL {i}\nRGB {c[0]} {c[1]} {c[2]}\nSPECEX 0\n"
                f"SPECRGB .95 .95 .95\nREFL 1\nREFR 0\nREFRIOR 0\nEMITTANCE 0\n"
            )
        if kind == 2:  # glass
            return (
                f"MATERIAL {i}\nRGB .98 .98 .98\nSPECEX 0\n"
                f"SPECRGB .98 .98 .98\nREFL 0\nREFR 1\nREFRIOR 1.5\nEMITTANCE 0\n"
            )
        if kind == 3 and i % 8 == 7:  # small colored lights sprinkled in
            return (
                f"MATERIAL {i}\nRGB {c[0]} {c[1]} {c[2]}\nSPECEX 0\n"
                f"SPECRGB 0 0 0\nREFL 0\nREFR 0\nREFRIOR 0\nEMITTANCE 3\n"
            )
        if kind == 3:  # glossy mix (probabilistic spec/diffuse split)
            return (
                f"MATERIAL {i}\nRGB {c[0]} {c[1]} {c[2]}\nSPECEX 0\n"
                f"SPECRGB .9 .9 .9\nREFL 0.35\nREFR 0\nREFRIOR 0\nEMITTANCE 0\n"
            )
        return (  # diffuse
            f"MATERIAL {i}\nRGB {c[0]} {c[1]} {c[2]}\nSPECEX 0\n"
            f"SPECRGB 0 0 0\nREFL 0\nREFR 0\nREFRIOR 0\nEMITTANCE 0\n"
        )

    for i in range(n_materials):
        lines.append(material(i))

    lines.append(
        "CAMERA\nRES 1920 1080\nFOVY 28\nITERATIONS 2000\nDEPTH 8\n"
        "FILE many_materials\nEYE 0 7 17\nLOOKAT 0 6.5 0\nUP 0 1 0\n"
    )

    obj = 0

    def cube(mat, trans, scale, rotat=(0, 0, 0)):
        nonlocal obj
        s = (
            f"OBJECT {obj}\ncube\nmaterial {mat}\n"
            f"TRANS {trans[0]} {trans[1]} {trans[2]}\n"
            f"ROTAT {rotat[0]} {rotat[1]} {rotat[2]}\n"
            f"SCALE {scale[0]} {scale[1]} {scale[2]}\n"
        )
        obj += 1
        return s

    def sphere(mat, trans, scale):
        nonlocal obj
        s = (
            f"OBJECT {obj}\nsphere\nmaterial {mat}\n"
            f"TRANS {trans[0]} {trans[1]} {trans[2]}\n"
            f"ROTAT 0 0 0\nSCALE {scale[0]} {scale[1]} {scale[2]}\n"
        )
        obj += 1
        return s

    # room shell
    lines.append(cube(0, (0, 13.8, 0), (10, 0.3, 10)))     # key light
    lines.append(cube(1, (0, 0, 0), (40, 0.01, 40)))       # floor
    lines.append(cube(1, (0, 14, 0), (40, 0.01, 40)))      # ceiling
    lines.append(cube(1, (0, 7, -8), (40, 14, 0.01)))      # back wall
    lines.append(cube(2, (-16, 7, 0), (0.01, 14, 40)))     # left wall
    lines.append(cube(3, (16, 7, 0), (0.01, 14, 40)))      # right wall

    # sphere grid
    for gy in range(grid_y):
        for gx in range(grid_x):
            i = gy * grid_x + gx
            mat = 4 + (i % (n_materials - 4))
            x = -12.5 + 25 * gx / max(grid_x - 1, 1)
            y = 2.2 + 3.1 * gy
            z = -5 + 3.0 * ((i * 7) % 5) / 4.0
            r = 1.7 + 0.4 * ((i * 3) % 3)
            lines.append(sphere(mat, (round(x, 2), round(y, 2), round(z, 2)), (r, r, r)))

    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}: {n_materials} materials, {obj} objects")


if __name__ == "__main__":
    emit(sys.argv[1] if len(sys.argv) > 1 else "scenes/many_materials.txt")
