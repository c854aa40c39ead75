# Build / test / bench entry points, equivalent of the reference's
# top-level Makefile + contrib/trainer/Makefile (cargo lib + TF-op build):
# here the only ahead-of-time artifact is the C++ SGF example extractor.

PY ?= python

all: dream_go_tpu/native/libdg_data.so

dream_go_tpu/native/libdg_data.so: dream_go_tpu/native/sgf_extract.cc
	$(PY) -c "from dream_go_tpu import native; assert native.available()"

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

clean:
	rm -f dream_go_tpu/native/libdg_data.so

.PHONY: all test bench clean
