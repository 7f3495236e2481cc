// Harness: drive the reference Entropy::codeCoeffNxN on crafted levels and
// dump the CABAC bytes, for differential testing of the Python encoder.
#define private public
#define protected public
#include "common.h"
#include "bitstream.h"
#include "entropy.h"
#include "slice.h"
#include "cudata.h"
#include "frame.h"
#include "framedata.h"
#include "primitives.h"
using namespace X265_NS;

int main(int argc, char** argv)
{
    // args: log2size isLuma intraMode qp ; levels on stdin (n*n ints, raster)
    int log2 = atoi(argv[1]);
    int isLuma = atoi(argv[2]);
    int mode = atoi(argv[3]);
    int qp = atoi(argv[4]);
    int n = 1 << log2;

    fprintf(stderr, "A\n");    x265_param* param = x265_param_alloc();
    x265_param_default(param);
    x265_setup_primitives(param);
    param->sourceWidth = 64; param->sourceHeight = 64;
    param->maxCUSize = 32; param->minCUSize = 16;
    param->internalCsp = X265_CSP_I420;
    param->bEnableSignHiding = 0;
    param->bEnableTransformSkip = 0;
    param->bLossless = 0;

    fprintf(stderr, "B\n");    SPS sps; memset(&sps, 0, sizeof(sps));
    PPS pps; memset(&pps, 0, sizeof(pps));
    pps.bSignHideEnabled = 0;
    pps.bTransformSkipEnabled = 0;
    Slice slice;
    slice.m_sliceType = I_SLICE;
    slice.m_sliceQp = qp;
    slice.m_pps = &pps;
    slice.m_sps = &sps;
    slice.m_param = param;

    // minimal CUData with the fields codeCoeffNxN touches
    fprintf(stderr, "C\n");    CUData cu;
    memset(&cu, 0, sizeof(cu));
    static uint8_t tqBypass[256] = {0};
    static uint8_t predMode[256]; memset(predMode, MODE_INTRA, 256);
    static uint8_t lumaDir[256]; memset(lumaDir, mode, 256);
    static uint8_t chromaDir[256]; memset(chromaDir, mode, 256);
    static uint8_t transformSkip[3][256]; memset(transformSkip, 0, sizeof(transformSkip));
    cu.m_tqBypass = tqBypass;
    cu.m_predMode = predMode;
    cu.m_lumaIntraDir = lumaDir;
    cu.m_chromaIntraDir = chromaDir;
    cu.m_transformSkip[0] = transformSkip[0];
    cu.m_transformSkip[1] = transformSkip[1];
    cu.m_transformSkip[2] = transformSkip[2];
    cu.m_slice = &slice;
    cu.m_chromaFormat = X265_CSP_I420;
    cu.m_hChromaShift = 1;
    cu.m_vChromaShift = 1;

    ALIGN_VAR_32(coeff_t, coeff[32 * 32]);
    for (int i = 0; i < n * n; i++) { int v; scanf("%d", &v); coeff[i] = (coeff_t)v; }

    fprintf(stderr, "D\n");    Bitstream bs;
    Entropy ent;
    ent.setBitstream(&bs);
    fprintf(stderr, "E\n");    ent.resetEntropy(slice);
    for (int i = 0; i < 157; i++) fprintf(stderr, "CTX %d %d\n", i, ent.m_contextState[i]);
    ent.start();

    fprintf(stderr, "F\n");    ent.codeCoeffNxN(cu, coeff, 0, log2, isLuma ? TEXT_LUMA : TEXT_CHROMA_U);
    ent.encodeBinTrm(1);
    ent.finish();
    // dump bytes
    fprintf(stderr, "G\n");    printf("BYTES ");
    const uint8_t* p = bs.getFIFO();
    for (uint32_t i = 0; i < bs.getNumberOfWrittenBytes(); i++) printf("%02x", p[i]);
    printf("\nBITS %u\n", bs.getNumberOfWrittenBits());
    return 0;
}
