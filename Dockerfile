# Deployment image for the TPU-native k-mer annotation engine.
# Counterpart of the reference's KBase sdkbase image + entrypoint
# (ref /root/reference/Dockerfile, scripts/entrypoint.sh).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /kb/module
COPY pyproject.toml README.md ./
COPY kmergutsjava_tpu ./kmergutsjava_tpu
COPY native ./native
COPY scripts ./scripts
RUN pip install --no-cache-dir . \
    && g++ -O2 -o /usr/local/bin/kmer_guts_baseline native/kmer_guts_baseline.cpp \
    && g++ -O3 -shared -fPIC -o native/feeder.so native/feeder.cpp

# Reference data (kmer.table.mem_map + function.index) mounts at /data,
# matching the reference test harness convention.
VOLUME ["/data"]
EXPOSE 5000

ENTRYPOINT ["/kb/module/scripts/entrypoint.sh"]
