# Top-level targets (the reference exposes meson/autotools targets incl.
# a Doxygen docs target, meson.build:60-81; these are the equivalents)

.PHONY: native test bench docs clean

native:
	$(MAKE) -C libzseek_tpu/native

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

docs:
	mkdir -p build/docs
	cd build/docs && for m in libzseek_tpu libzseek_tpu.api \
	  libzseek_tpu.runtime.writer libzseek_tpu.runtime.reader \
	  libzseek_tpu.runtime.zstd_codec libzseek_tpu.runtime.codec \
	  libzseek_tpu.format.seek_table libzseek_tpu.parallel.mesh \
	  libzseek_tpu.parallel.distributed; do \
	  PYTHONPATH=$(CURDIR) JAX_PLATFORMS=cpu python -m pydoc -w $$m; \
	done && ls *.html

clean:
	$(MAKE) -C libzseek_tpu/native clean
	rm -rf build
