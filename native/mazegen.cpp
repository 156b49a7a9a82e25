// Native maze-pool generator.
//
// Host-side batch generation of wide-corridor DFS mazes for the device map
// pool (see rlenv_tpu/env/mapgen.py). The algorithm mirrors the reference's
// `_generate_map_maze` + carving helpers
// (/root/reference/gradio-app/plantos_env_new.py:408-604): start fully
// walled, randomized DFS over a (g-1)/6 meta-grid, 5x5 rooms with
// 30%-chance extensions and a 40%-chance corner cut, width-5 corridors,
// 20%-chance 2x2 bulges.
//
// Python's per-maze DFS costs milliseconds; amortized over pools of
// thousands of layouts (fresh pool per training run / per curriculum
// sweep) the native path keeps pool regeneration off the training-startup
// critical path. Exposed as a tiny C ABI consumed via ctypes — no pybind11
// required.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

struct Rng {
  std::mt19937_64 gen;
  explicit Rng(uint64_t seed) : gen(seed) {}
  // uniform in [0, n)
  int below(int n) {
    return static_cast<int>(std::uniform_int_distribution<int>(0, n - 1)(gen));
  }
  double uniform() {
    return std::uniform_real_distribution<double>(0.0, 1.0)(gen);
  }
};

class MazeCarver {
 public:
  MazeCarver(int g, uint8_t* walls, Rng& rng)
      : g_(g), walls_(walls), rng_(rng) {}

  void carve() {
    std::memset(walls_, 1, g_ * g_);
    const int meta_w = (g_ - 1) / 6;
    const int meta_h = (g_ - 1) / 6;
    if (meta_w <= 0 || meta_h <= 0) return;

    std::vector<uint8_t> visited(meta_w * meta_h, 0);
    std::vector<std::pair<int, int>> stack;
    int sx = rng_.below(meta_w), sy = rng_.below(meta_h);
    stack.emplace_back(sx, sy);
    visited[sx * meta_h + sy] = 1;
    carve_room(sx, sy);

    const int dirs[4][2] = {{0, 1}, {0, -1}, {1, 0}, {-1, 0}};
    while (!stack.empty()) {
      auto [cx, cy] = stack.back();
      int neighbors[4][4];
      int n = 0;
      for (auto& d : dirs) {
        int nx = cx + d[0], ny = cy + d[1];
        if (nx >= 0 && nx < meta_w && ny >= 0 && ny < meta_h &&
            !visited[nx * meta_h + ny]) {
          neighbors[n][0] = nx;
          neighbors[n][1] = ny;
          neighbors[n][2] = d[0];
          neighbors[n][3] = d[1];
          n++;
        }
      }
      if (n > 0) {
        int pick = rng_.below(n);
        int nx = neighbors[pick][0], ny = neighbors[pick][1];
        int dx = neighbors[pick][2], dy = neighbors[pick][3];
        carve_corridor(cx, cy, nx, ny);
        if (rng_.uniform() < 0.2) add_bulge(cx, cy, nx, ny, dx, dy);
        carve_room(nx, ny);
        visited[nx * meta_h + ny] = 1;
        stack.emplace_back(nx, ny);
      } else {
        stack.pop_back();
      }
    }
  }

  int open_cells() const {
    int open = 0;
    for (int i = 0; i < g_ * g_; ++i) open += walls_[i] == 0;
    return open;
  }

 private:
  void open_rect(int x0, int x1, int y0, int y1) {
    // half-open [x0,x1) x [y0,y1), clipped to the grid
    if (x0 < 0) x0 = 0;
    if (y0 < 0) y0 = 0;
    if (x1 > g_) x1 = g_;
    if (y1 > g_) y1 = g_;
    for (int x = x0; x < x1; ++x)
      for (int y = y0; y < y1; ++y) walls_[x * g_ + y] = 0;
  }

  void carve_room(int mx, int my) {
    int bx = mx * 6 + 1, by = my * 6 + 1;
    open_rect(bx, bx + 5, by, by + 5);
    if (rng_.uniform() < 0.3)  // extend right (+x), rows 2..3
      open_rect(bx + 5, bx + 7, by + 2, by + 4);
    if (rng_.uniform() < 0.3)  // extend down (+y)
      open_rect(bx + 2, bx + 4, by + 5, by + 7);
    if (rng_.uniform() < 0.4) {  // re-wall one corner cell
      static const int corners[4][2] = {{0, 0}, {4, 0}, {0, 4}, {4, 4}};
      const int* c = corners[rng_.below(4)];
      int px = bx + c[0], py = by + c[1];
      if (px >= 0 && px < g_ && py >= 0 && py < g_) walls_[px * g_ + py] = 1;
    }
  }

  void carve_corridor(int ax, int ay, int bx, int by, int width = 5) {
    if (ax == bx) {  // vertical meta run
      int lo = ay < by ? ay : by, hi = ay < by ? by : ay;
      for (int my = lo; my <= hi; ++my) {
        int x0 = ax * 6 + 1, y0 = my * 6 + 1;
        open_rect(x0, x0 + width, y0, y0 + 6);
      }
    } else {  // horizontal
      int lo = ax < bx ? ax : bx, hi = ax < bx ? bx : ax;
      for (int mx = lo; mx <= hi; ++mx) {
        int x0 = mx * 6 + 1, y0 = ay * 6 + 1;
        open_rect(x0, x0 + 6, y0, y0 + width);
      }
    }
  }

  void add_bulge(int ax, int ay, int bx, int by, int dx, int dy) {
    int mx = (ax + bx) / 2, my = (ay + by) / 2;
    int side = rng_.uniform() < 0.5 ? -1 : 1;
    int x0, y0;
    if (dx == 0) {  // vertical path: bulge horizontally
      x0 = mx * 6 + 2 + side * 2;
      y0 = my * 6 + 2;
    } else {
      x0 = mx * 6 + 2;
      y0 = my * 6 + 2 + side * 2;
    }
    open_rect(x0, x0 + 2, y0, y0 + 2);
  }

  int g_;
  uint8_t* walls_;
  Rng& rng_;
};

}  // namespace

extern "C" {

// Fill `out` (count * grid * grid bytes, 1 = wall) with maze layouts.
// A layout whose open space can't fit `min_open` cells is regenerated from
// the stream (mirroring the reference's fallback trigger,
// plantos_env_new.py:464-467, except natively we can just retry);
// gives up after 64 attempts per slot and leaves the best attempt.
// Returns the number of layouts that satisfied min_open.
int rlenv_generate_maze_pool(uint64_t seed, int grid, int count,
                             int min_open, uint8_t* out) {
  Rng rng(seed);
  int ok = 0;
  for (int i = 0; i < count; ++i) {
    uint8_t* walls = out + static_cast<size_t>(i) * grid * grid;
    bool satisfied = false;
    for (int attempt = 0; attempt < 64 && !satisfied; ++attempt) {
      MazeCarver carver(grid, walls, rng);
      carver.carve();
      satisfied = carver.open_cells() >= min_open;
    }
    ok += satisfied;
  }
  return ok;
}

}  // extern "C"
