.PHONY: test test-fast bench native entry clean loc

test:
	python -m pytest tests/ -q

# Fast-suite time budget (VERDICT r3 #8): the iterating suite must stay
# under 5 min solo on this 1-core host. 360 s allows for background load;
# a breach means share fixtures / slow-mark, not raise the budget.
FAST_BUDGET_S ?= 360
test-fast:
	@t0=$$(date +%s); \
	python -m pytest tests/ -m "not slow" -q; rc=$$?; \
	el=$$(( $$(date +%s) - t0 )); \
	echo "fast suite: $${el}s (budget $(FAST_BUDGET_S)s)"; \
	[ $$rc -eq 0 ] || exit $$rc; \
	[ $$el -le $(FAST_BUDGET_S) ] || { echo "FAST SUITE OVER BUDGET"; exit 1; }

# Canonical, auditable LoC accounting (ADVICE r3): non-test source split
# by bucket so cross-round comparisons use one fixed file set.
loc:
	@echo "package:";      find protoasnet_tpu -name '*.py' | sort | xargs wc -l | tail -1
	@echo "native C++:";   find native -name '*.cpp' -o -name '*.h' -o -name 'Makefile' | sort | xargs wc -l | tail -1
	@echo "entry points:"; wc -l main.py explain.py __graft_entry__.py | tail -1
	@echo "bench:";        wc -l bench.py bench_baseline_torch.py | tail -1
	@echo "experiments:";  find experiments -name '*.py' -o -name '*.sh' | sort | xargs wc -l | tail -1
	@echo "tests:";        find tests -name '*.py' | sort | xargs wc -l | tail -1

bench:
	python bench.py

bench-full:
	python bench.py --train --suite

native:
	$(MAKE) -C native

entry:
	python __graft_entry__.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
