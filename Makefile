# Developer entry points (the reference's Makefile smoke-checks its CUDA
# stack; ours checks the TPU/JAX stack and runs the suite).

.PHONY: test smoke native bench clean

smoke:
	python -c "import jax; print('devices:', jax.devices())"
	python -c "import sps_tpu; print('sps_tpu', sps_tpu.__version__)"
	python -c "from sps_tpu import native; print('native data plane:', native.available())"

native:
	$(MAKE) -C csrc

test:
	@# One pytest process per file: a single long process accumulating 60+
	@# XLA:CPU compiles segfaults sporadically on migrating hosts (see
	@# tests/conftest.py); per-file isolation also pinpoints crashes.
	@set -e; for f in tests/test_*.py; do 		echo "== $$f"; python -m pytest $$f -q || exit 1; 	done

bench:
	python bench.py

clean:
	$(MAKE) -C csrc clean
	rm -rf .jax_cache
