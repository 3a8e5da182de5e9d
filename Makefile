# Convenience targets (the reference's Makefile/Doxyfile analog).

.PHONY: docs test lint

docs:
	python docs/generate.py

test:
	python -m pytest tests/ -x -q

lint:
	python -m flake8 dpdk_dc_sand_tpu || true
