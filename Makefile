.PHONY: test test-fast converge bench bench-all native clean verify-entry

test:
	python -m pytest tests/ -q

# fast lane (~5 min vs ~16 for the full suite): skips tests marked 'slow'
test-fast:
	python -m pytest tests/ -q -m "not slow"

# convergence regression suite: trains all 8 CLI entries on separable
# synthetic data to a per-entry UAR floor (tests/test_convergence.py)
converge:
	python -m pytest tests/test_convergence.py -q -m converge

bench:
	python bench.py

bench-all:
	python benchmarks/bench_all.py --train --out benchmarks/results_v5e.json

native:
	$(MAKE) -C native

verify-entry:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c "\
	import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as g; \
	fn, (v, b) = g.entry(); jax.jit(fn)(v, b); g.dryrun_multichip(8)"

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
