.PHONY: test test-fast test-contract converge bench bench-all native clean verify-entry

# pre-commit bar: the full suite minus the convergence lane (which trains
# all 8 entries for many epochs, ~25 min on its own — run `make converge`
# per milestone batch / per round instead of per commit)
test:
	python -m pytest tests/ -q -m "not converge"

# never-skip floor (<2 min): cli imports, 8-family export discovery,
# __graft_entry__ trace, bench.py JSON schema, --from_run round-trip.
# Run per COMMIT even when the ~35-min `make test` bar is deferred to the
# end of a milestone batch (round 4 shipped 5 commits on a red HEAD).
test-contract:
	python -m pytest tests/test_contract.py -q

# fast lane: skips tests marked 'slow' (wall times in docs/STATUS.md)
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
