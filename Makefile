# Build/test entry points for the TPU-native PA*-MSA framework.
# (The reference drives everything through a Makefile, ref: Makefile:75-92;
# here the Python package needs no compilation, only the native C engines.)

CC ?= gcc
CFLAGS ?= -O3 -march=native -shared -fPIC

.PHONY: all native test bench warmcache warmcheck clean

all: native

native: native/libfastastar.so native/libfastastar_mt.so

native/libfastastar.so: native/fast_astar.c
	$(CC) $(CFLAGS) $< -o $@

native/libfastastar_mt.so: native/fast_astar_mt.c
	$(CC) $(CFLAGS) -pthread $< -o $@

test:
	python -m pytest tests/ -x -q

# Pre-populate the persistent XLA compilation cache (PF08184 + kinase step
# programs) so a later bench/TPU run pays seconds, not minutes, per retry.
warmcache:
	python scripts/warm_cache.py

# Fails loudly when the export-cache key drifted since the last warmcache
# (i.e. the next fresh process would pay the full retrace).
warmcheck:
	python scripts/warm_cache.py --check

bench:
	python bench.py

clean:
	rm -f native/libfastastar.so native/libfastastar_mt.so
	rm -rf .jax_cache __pycache__
