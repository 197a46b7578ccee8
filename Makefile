# Task runner (analogue of the reference's pixi.toml tasks).

.PHONY: test test-tpu validate repro figures bench bench-shapes flagship coldstart lint

test:
	python -m pytest tests/ -q

test-tpu:
	NBMF_TEST_PLATFORM=axon python -m pytest tests/ -m tpu -q

validate:
	python experiments/validate_implementation.py

repro:
	python experiments/reproduce_magron2022.py

figures:
	python experiments/display_results.py

bench:
	python bench.py

bench-shapes:
	python tools/bench_shapes.py

flagship:
	python experiments/flagship_scale.py --ceiling --sparse

coldstart:
	python tools/bench_coldstart.py

lint:
	python -m compileall -q nbmf_mm_tpu experiments tests bench.py __graft_entry__.py

test-reference:
	python tools/run_reference_suite.py
