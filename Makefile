# Build targets mirroring the reference's makefile surface
# (binary + libs, makefile:9-18) in this project's terms.

.PHONY: all native test bench clean

all: native

native: gp_ss_ak_tpu/native/_loader.so

gp_ss_ak_tpu/native/_loader.so: gp_ss_ak_tpu/native/loader.cpp
	g++ -O3 -shared -fPIC -std=c++17 $< -o $@

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -f gp_ss_ak_tpu/native/_loader.so
	find . -name __pycache__ -type d -exec rm -rf {} +
