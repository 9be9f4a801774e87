// Validate a .nvdb file through NanoVDB's OWN tree traversal.
//
// Reads the file with the exact header structs the reference uses
// (ref: src/testbed_volume.cu:526-552), reinterpret_casts the grid
// payload as nanovdb::FloatGrid, and dumps getValue(i,j,k) for the whole
// (inclusive) index bbox as raw little-endian f32 (x-major, z fastest) to
// stdout. tests/test_nanovdb_real.py compiles this against the VENDORED
// NanoVDB.h (v32.3) and compares the accessor's view with the source
// array — proving our writer emits, and our reader parses, the real ABI
// rather than each other's assumptions.
//
// Build (test does this): g++ -O1 -std=c++17 -I<nanovdb include dir>
//     csrc/nvdb_check.cpp -o nvdb_check
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <vector>

#include <nanovdb/NanoVDB.h>

namespace {

constexpr uint64_t kMagic = 0x304244566f6e614eUL;  // "NanoVDB0"

struct FileHeader {
    uint64_t magic;
    uint32_t version;
    uint16_t gridCount;
    uint16_t codec;
};
static_assert(sizeof(FileHeader) == 16, "padding");

struct FileMetaData {
    uint64_t gridSize, fileSize, nameKey, voxelCount;
    uint32_t gridType;
    uint32_t gridClass;
    double worldBBox[2][3];
    int indexBBox[2][3];
    double voxelSize[3];
    uint32_t nameSize;
    uint32_t nodeCount[4];
    uint32_t tileCount[3];
    uint16_t codec;
    uint16_t padding;
    uint32_t version;
};
static_assert(sizeof(FileMetaData) == 176, "padding");

}  // namespace

int main(int argc, char** argv) {
    if (argc != 2) {
        fprintf(stderr, "usage: %s file.nvdb\n", argv[0]);
        return 2;
    }
    std::ifstream f(argv[1], std::ios::in | std::ios::binary);
    if (!f) { fprintf(stderr, "cannot open %s\n", argv[1]); return 2; }
    FileHeader header;
    FileMetaData meta;
    f.read(reinterpret_cast<char*>(&header), sizeof(header));
    f.read(reinterpret_cast<char*>(&meta), sizeof(meta));
    if (header.magic != kMagic) { fprintf(stderr, "bad magic\n"); return 2; }
    if (header.gridCount == 0 || meta.codec != 0) {
        fprintf(stderr, "unsupported file\n");
        return 2;
    }
    std::vector<char> name(meta.nameSize);
    f.read(name.data(), meta.nameSize);
    std::vector<char> buf(meta.gridSize);
    f.read(buf.data(), meta.gridSize);
    if (!f) { fprintf(stderr, "truncated grid payload\n"); return 2; }

    const auto* grid = reinterpret_cast<const nanovdb::FloatGrid*>(buf.data());
    if (grid->gridType() != nanovdb::GridType::Float) {
        fprintf(stderr, "not a FloatGrid\n");
        return 2;
    }
    // independent checks the python test asserts on via stderr
    fprintf(stderr, "name=%s voxels=%llu leaves=%u\n", grid->gridName(),
            (unsigned long long)grid->activeVoxelCount(),
            grid->tree().nodeCount(0));

    auto acc = grid->tree().getAccessor();
    const int* lo = meta.indexBBox[0];
    const int* hi = meta.indexBBox[1];  // inclusive
    for (int i = lo[0]; i <= hi[0]; ++i)
        for (int j = lo[1]; j <= hi[1]; ++j)
            for (int k = lo[2]; k <= hi[2]; ++k) {
                float v = acc.getValue(nanovdb::Coord(i, j, k));
                fwrite(&v, sizeof(float), 1, stdout);
            }
    return 0;
}
