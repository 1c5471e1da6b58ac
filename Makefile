# Reference parity: /root/reference/Makefile (build + test entry points).

.PHONY: all native test examples bench clean

all: native

native:
	$(MAKE) -C essentials_tpu/native

test: native
	python -m pytest tests/ -q

examples: native
	python examples/run_all.py --cpu

bench: native
	python bench.py

clean:
	$(MAKE) -C essentials_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
