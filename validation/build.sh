#!/bin/bash
# Build the reference solver (read-only headers from /root/reference) with
# the single-rank MPI shim, using the reference's own optimization flags
# (CMakeLists.txt:21) minus -march bits unavailable here.
set -e
cd "$(dirname "$0")"
mkdir -p build
g++ -O3 -march=native -funroll-loops -ffast-math -fopenmp -std=c++20 \
    -I mpi_stub -I /root/reference/include \
    ref_driver.cpp -o build/ref_driver
echo "built validation/build/ref_driver"
g++ -O3 -march=native -funroll-loops -ffast-math -fopenmp -std=c++20 \
    -I mpi_stub -I /root/reference/include \
    ref_dump_f.cpp -o build/ref_dump_f
echo "built validation/build/ref_dump_f"
