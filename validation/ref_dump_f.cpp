// Debug driver: run the unmodified reference solver for N steps, then dump
// the raw interior f_current populations (post-BC state) as binary f64 in
// (Q, ny, nx) order — for cell-level state comparison against tpulbm.
// Usage: ref_dump_f <tau> <u> <nx> <ny> <steps> <out.bin>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "LBMConfig.h"
#include "LBMSolver.h"
#include "LBMIO.h"

int main(int argc, char** argv) {
  MPI_Init(&argc, &argv);
  LBM::SimulationParams p;
  p.tau = std::atof(argv[1]);
  p.inlet_velocity = std::atof(argv[2]);
  p.nx = std::atoi(argv[3]);
  p.ny = std::atoi(argv[4]);
  p.num_timesteps = std::atoi(argv[5]);
  p.output_frequency = 1 << 30;  // no frames, one t=0 force row

  LBM::Solver solver(p, false);
  LBM::IOManager io;
  solver.initialise();
  bool ok = solver.run(io);
  const LBM::Grid& g = solver.get_grid();

  std::vector<double> out((size_t)LBM::Q * p.ny * p.nx);
  for (int i = 0; i < LBM::Q; ++i)
    for (int y = 0; y < p.ny; ++y)
      for (int x = 0; x < p.nx; ++x)
        out[((size_t)i * p.ny + y) * p.nx + x] = g.f_current(x + 1, y + 1, i);
  FILE* f = std::fopen(argv[6], "wb");
  std::fwrite(out.data(), sizeof(double), out.size(), f);
  std::fclose(f);
  std::printf(ok ? "OK\n" : "UNSTABLE\n");
  MPI_Finalize();
  return 0;
}
