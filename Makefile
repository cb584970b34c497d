# Build/test entry points (counterpart of the reference's Makefile/build.xml)
.PHONY: all test bench baseline clean

all: baseline feeder grouping scatter fasta

baseline: native/kmer_guts_baseline

native/kmer_guts_baseline: native/kmer_guts_baseline.cpp
	g++ -O2 -o $@ $<

feeder: kmergutsjava_tpu/native/feeder.so

kmergutsjava_tpu/native/feeder.so: kmergutsjava_tpu/native/feeder.cpp kmergutsjava_tpu/native/threading.h
	g++ -O3 -shared -fPIC -pthread -o $@ $<

grouping: kmergutsjava_tpu/native/grouping.so

kmergutsjava_tpu/native/grouping.so: kmergutsjava_tpu/native/grouping.cpp kmergutsjava_tpu/native/threading.h
	g++ -O3 -shared -fPIC -pthread -o $@ $<

scatter: kmergutsjava_tpu/native/scatter.so

kmergutsjava_tpu/native/scatter.so: kmergutsjava_tpu/native/scatter.cpp kmergutsjava_tpu/native/threading.h
	g++ -O3 -shared -fPIC -pthread -o $@ $<

fasta: kmergutsjava_tpu/native/fasta.so

kmergutsjava_tpu/native/fasta.so: kmergutsjava_tpu/native/fasta.cpp
	g++ -O3 -shared -fPIC -pthread -o $@ $<

test:
	python -m pytest tests/ -x -q

test-full:
	KMER_ECOLI_FULL=1 python -m pytest tests/ -x -q

bench: baseline
	python bench.py

clean:
	rm -f native/kmer_guts_baseline kmergutsjava_tpu/native/*.so
