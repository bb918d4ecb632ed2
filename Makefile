# Build/test entry points for the TPU-native PA*-MSA framework.
# (The reference drives everything through a Makefile, ref: Makefile:75-92;
# here the Python package needs no compilation, only the native C engine.)

CC ?= gcc
CFLAGS ?= -O3 -march=native -shared -fPIC

.PHONY: all native test bench clean

all: native

native: native/libfastastar.so

native/libfastastar.so: native/fast_astar.c
	$(CC) $(CFLAGS) $< -o $@

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -f native/libfastastar.so
	rm -rf .jax_cache __pycache__
