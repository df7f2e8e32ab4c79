.PHONY: test bench native entry clean

test:
	python -m pytest tests/ -q

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
