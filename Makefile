# Convenience targets (the reference ships a GNUmakefile wrapper with
# `make run` = render the default scene).

PY ?= python
SCENE ?= scenes/cornell.txt

run:
	$(PY) -m project3_cuda_path_tracer_tpu $(SCENE) --pallas

preview:
	$(PY) -m project3_cuda_path_tracer_tpu $(SCENE) --preview

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

mesh-assets:
	$(PY) tools/gen_mesh.py icosphere 4 scenes/assets/icosphere.obj
	$(PY) tools/gen_mesh.py knot 200 12 scenes/assets/knot.obj
	$(PY) tools/gen_scene.py scenes/many_materials.txt
	$(PY) tools/gen_textures.py scenes/assets

.PHONY: run preview test bench mesh-assets
