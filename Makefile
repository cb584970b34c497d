# Build/test entry points (counterpart of the reference's Makefile/build.xml)
.PHONY: all test bench baseline clean

all: baseline feeder grouping scatter fasta

baseline: native/kmer_guts_baseline

native/kmer_guts_baseline: native/kmer_guts_baseline.cpp
	g++ -O2 -o $@ $<

feeder: native/feeder.so

native/feeder.so: native/feeder.cpp
	g++ -O3 -shared -fPIC -o $@ $<

grouping: native/grouping.so

native/grouping.so: native/grouping.cpp
	g++ -O3 -shared -fPIC -o $@ $<

scatter: native/scatter.so

native/scatter.so: native/scatter.cpp
	g++ -O3 -shared -fPIC -o $@ $<

fasta: native/fasta.so

native/fasta.so: native/fasta.cpp
	g++ -O3 -shared -fPIC -o $@ $<

test:
	python -m pytest tests/ -x -q

test-full:
	KMER_ECOLI_FULL=1 python -m pytest tests/ -x -q

bench: baseline
	python bench.py

clean:
	rm -f native/kmer_guts_baseline native/feeder.so native/grouping.so \
	      native/scatter.so native/fasta.so
