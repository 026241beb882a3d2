# Developer entry points (the reference's Makefile smoke-checks its CUDA
# stack; ours checks the TPU/JAX stack and runs the suite).

.PHONY: test test-fast smoke native bench clean

# Two-tier test workflow: `make test-fast` runs the unit/oracle files
# (hash, sparse-conv oracles, ME order, converter, geometry/augment,
# halo VJP, native data plane, registration) in a few minutes on one
# CPU core (measured r4 on this host: test_convert 2m15s after moving it
# to the gather engine + one shared init; the other files are seconds);
# `make test` adds the compile-heavy model/e2e/mesh files
# (engine parity, train->resume->predict, dp/sp on the 8-device virtual
# mesh, streaming, baselines) and costs >1 h cold. CI gates merges on
# the full suite; iterate locally with the fast tier.
FAST_TESTS = tests/test_hash.py tests/test_sparse.py tests/test_brick.py \
	tests/test_me_order.py tests/test_convert.py tests/test_halo_vjp.py \
	tests/test_radius_augment.py tests/test_native.py tests/test_register.py \
	tests/test_int8.py tests/test_checkpoint_reassoc.py

test-fast:
	@set -e; for f in $(FAST_TESTS); do \
		echo "== $$f"; python -m pytest $$f -q || exit 1; \
	done

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
