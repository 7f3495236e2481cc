"""Parameter-set and slice-header syntax writers (spec 7.3.2-7.3.6).

Reference behavior studied (not copied):
  /root/reference/source/encoder/entropy.cpp codeVPS/codeSPS/codePPS/
  codeProfileTier/codeSliceHeader, sei.cpp.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from .bitio import (BitWriter, wrap_nal, NAL_VPS, NAL_SPS, NAL_PPS,
                    NAL_IDR_W_RADL, NAL_PREFIX_SEI, NAL_SUFFIX_SEI)


@dataclass
class ProfileTierLevel:
    profile_idc: int = 1          # Main
    tier_flag: int = 0
    level_idc: int = 120          # level 4.0 (x30)
    progressive_source: int = 1
    interlaced_source: int = 0
    non_packed: int = 1
    frame_only: int = 1
    intra_constraint: int = 0
    bit_depth_constraint: int = 8
    chroma_constraint: int = 1


@dataclass
class SPSInfo:
    width: int = 0                  # coded luma width (CTU multiple here)
    height: int = 0
    conf_win: Tuple[int, int, int, int] = (0, 0, 0, 0)  # l, r, t, b (luma px)
    chroma_format_idc: int = 1
    bit_depth: int = 8
    log2_max_poc_lsb: int = 8
    log2_min_cb: int = 3
    log2_diff_max_min_cb: int = 3
    log2_min_tb: int = 2
    log2_diff_max_min_tb: int = 3
    max_transform_hierarchy_depth_inter: int = 0
    max_transform_hierarchy_depth_intra: int = 0
    amp_enabled: int = 0
    sao_enabled: int = 0
    scaling_list: object = None     # ScalingListData or None (flat lists)
    temporal_mvp: int = 0
    strong_intra_smoothing: int = 1
    max_dec_pic_buffering: int = 1
    num_reorder_pics: int = 0
    ptl: ProfileTierLevel = field(default_factory=ProfileTierLevel)
    # VUI
    sar_idc: int = 0
    sar_wh: Tuple[int, int] = (0, 0)
    video_full_range: int = 0
    colour_description: Optional[Tuple[int, int, int]] = None
    # (colour_primaries, transfer_characteristics, matrix_coeffs) e.g.
    # (9, 16, 9) = BT.2020 / PQ / BT.2020nc for HDR10
    chroma_loc: Optional[int] = None    # chroma_sample_loc_type (0..5)
    timing_info: Optional[Tuple[int, int]] = None  # (num_units_in_tick, time_scale)
    # HRD (spec E.2.2 hrd_parameters + E.3 semantics; reference --hrd,
    # sei.cpp buffering period / pic timing): (max_bitrate_bps,
    # cpb_size_bits, cbr_flag) - requires timing_info
    hrd: Optional[Tuple[int, int, int]] = None

    @property
    def ctb_log2(self) -> int:
        return self.log2_min_cb + self.log2_diff_max_min_cb


@dataclass
class PPSInfo:
    sign_hiding: int = 0
    init_qp: int = 26
    constrained_intra: int = 0
    transform_skip: int = 0
    cu_qp_delta: int = 0
    diff_cu_qp_delta_depth: int = 0
    cb_qp_offset: int = 0
    cr_qp_offset: int = 0
    weighted_pred: int = 0
    weighted_bipred: int = 0
    transquant_bypass: int = 0
    entropy_coding_sync: int = 0    # WPP
    loop_filter_across_slices: int = 1
    deblocking_disabled: int = 0
    beta_offset_div2: int = 0
    tc_offset_div2: int = 0


def _profile_tier_level(bw: BitWriter, ptl: ProfileTierLevel, max_sub_layers: int = 1):
    bw.write_bits(0, 2)                      # general_profile_space
    bw.write_flag(ptl.tier_flag)             # general_tier_flag
    bw.write_bits(ptl.profile_idc, 5)        # general_profile_idc
    for j in range(32):
        bw.write_flag(1 if j == ptl.profile_idc else 0)  # compatibility flags
    bw.write_flag(ptl.progressive_source)
    bw.write_flag(ptl.interlaced_source)
    bw.write_flag(ptl.non_packed)
    bw.write_flag(ptl.frame_only)
    if ptl.profile_idc == 4:
        # Range Extensions (Main12 / Main 4:4:4): constraint flags replace
        # the reserved_zero_44bits (spec 7.3.3 / A.3.5)
        bd = ptl.bit_depth_constraint
        cc = ptl.chroma_constraint           # 1=<=4:2:0, 2=<=4:2:2, 3=4:4:4
        bw.write_flag(1)                     # general_max_12bit_constraint
        bw.write_flag(1 if bd <= 10 else 0)  # max_10bit
        bw.write_flag(1 if bd <= 8 else 0)   # max_8bit
        bw.write_flag(1 if cc <= 2 else 0)   # max_422chroma
        bw.write_flag(1 if cc <= 1 else 0)   # max_420chroma
        bw.write_flag(0)                     # max_monochrome
        bw.write_flag(0)                     # intra
        bw.write_flag(0)                     # one_picture_only
        bw.write_flag(1)                     # lower_bit_rate
        bw.write_bits(0, 17)                 # reserved_zero_34bits
        bw.write_bits(0, 17)
        bw.write_flag(0)                     # reserved_zero_bit (inbld)
    else:
        bw.write_bits(0, 16)                 # reserved_zero_44bits
        bw.write_bits(0, 16)
        bw.write_bits(0, 12)
    bw.write_bits(ptl.level_idc, 8)          # general_level_idc
    assert max_sub_layers == 1


def write_vps(sps: SPSInfo) -> bytes:
    bw = BitWriter()
    bw.write_bits(0, 4)          # vps_video_parameter_set_id
    bw.write_bits(3, 2)          # vps_reserved_three_2bits
    bw.write_bits(0, 6)          # vps_reserved_zero_6bits (max_layers_minus1)
    bw.write_bits(0, 3)          # vps_max_sub_layers_minus1
    bw.write_flag(1)             # vps_temporal_id_nesting_flag
    bw.write_bits(0xFFFF, 16)    # vps_reserved_0xffff_16bits
    _profile_tier_level(bw, sps.ptl)
    bw.write_flag(1)             # vps_sub_layer_ordering_info_present_flag
    bw.write_ue(sps.max_dec_pic_buffering - 1)
    bw.write_ue(sps.num_reorder_pics)
    bw.write_ue(0 + 1)           # vps_max_latency_increase_plus1
    bw.write_bits(0, 6)          # vps_max_layer_id
    bw.write_ue(0)               # vps_num_layer_sets_minus1
    bw.write_flag(0)             # vps_timing_info_present_flag
    bw.write_flag(0)             # vps_extension_flag
    bw.rbsp_trailing_bits()
    return wrap_nal(NAL_VPS, bw.get_bytes())


def write_sps(sps: SPSInfo) -> bytes:
    bw = BitWriter()
    bw.write_bits(0, 4)          # sps_video_parameter_set_id
    bw.write_bits(0, 3)          # sps_max_sub_layers_minus1
    bw.write_flag(1)             # sps_temporal_id_nesting_flag
    _profile_tier_level(bw, sps.ptl)
    bw.write_ue(0)               # sps_seq_parameter_set_id
    bw.write_ue(sps.chroma_format_idc)
    if sps.chroma_format_idc == 3:
        bw.write_flag(0)         # separate_colour_plane_flag
    bw.write_ue(sps.width)
    bw.write_ue(sps.height)
    l, r, t, b = sps.conf_win
    enabled = any((l, r, t, b))
    bw.write_flag(enabled)
    if enabled:
        hs = 1 if sps.chroma_format_idc in (1, 2) else 0
        vs = 1 if sps.chroma_format_idc == 1 else 0
        bw.write_ue(l >> hs)
        bw.write_ue(r >> hs)
        bw.write_ue(t >> vs)
        bw.write_ue(b >> vs)
    bw.write_ue(sps.bit_depth - 8)
    bw.write_ue(sps.bit_depth - 8)
    bw.write_ue(sps.log2_max_poc_lsb - 4)
    bw.write_flag(1)             # sps_sub_layer_ordering_info_present_flag
    bw.write_ue(sps.max_dec_pic_buffering - 1)
    bw.write_ue(sps.num_reorder_pics)
    bw.write_ue(0 + 1)           # sps_max_latency_increase_plus1
    bw.write_ue(sps.log2_min_cb - 3)
    bw.write_ue(sps.log2_diff_max_min_cb)
    bw.write_ue(sps.log2_min_tb - 2)
    bw.write_ue(sps.log2_diff_max_min_tb)
    bw.write_ue(sps.max_transform_hierarchy_depth_inter)
    bw.write_ue(sps.max_transform_hierarchy_depth_intra)
    if sps.scaling_list is None:
        bw.write_flag(0)         # scaling_list_enabled_flag
    else:
        from .scaling import write_scaling_list_data, ScalingListData
        bw.write_flag(1)         # scaling_list_enabled_flag
        sld = sps.scaling_list
        if all(sld.is_default(sz, l) for sz in range(4) for l in range(6)):
            bw.write_flag(0)     # sps_scaling_list_data_present -> defaults
        else:
            bw.write_flag(1)
            write_scaling_list_data(bw, sld)
    bw.write_flag(sps.amp_enabled)
    bw.write_flag(sps.sao_enabled)
    bw.write_flag(0)             # pcm_enabled_flag
    bw.write_ue(0)               # num_short_term_ref_pic_sets
    bw.write_flag(0)             # long_term_ref_pics_present_flag
    bw.write_flag(sps.temporal_mvp)
    bw.write_flag(sps.strong_intra_smoothing)
    vui_present = (sps.timing_info is not None or sps.sar_idc
                   or sps.video_full_range or sps.colour_description
                   or sps.chroma_loc is not None)
    bw.write_flag(1 if vui_present else 0)
    if vui_present:
        _write_vui(bw, sps)
    bw.write_flag(0)             # sps_extension_present_flag
    bw.rbsp_trailing_bits()
    return wrap_nal(NAL_SPS, bw.get_bytes())


def _write_vui(bw: BitWriter, sps: SPSInfo):
    if sps.sar_idc:
        bw.write_flag(1)
        bw.write_bits(sps.sar_idc, 8)
        if sps.sar_idc == 255:
            bw.write_bits(sps.sar_wh[0], 16)
            bw.write_bits(sps.sar_wh[1], 16)
    else:
        bw.write_flag(0)
    bw.write_flag(0)             # overscan_info_present_flag
    if sps.video_full_range or sps.colour_description:
        bw.write_flag(1)         # video_signal_type_present_flag
        bw.write_bits(5, 3)      # video_format unknown
        bw.write_flag(sps.video_full_range)
        if sps.colour_description:
            bw.write_flag(1)     # colour_description_present_flag
            prim, trc, mat = sps.colour_description
            bw.write_bits(prim, 8)
            bw.write_bits(trc, 8)
            bw.write_bits(mat, 8)
        else:
            bw.write_flag(0)
    else:
        bw.write_flag(0)
    if sps.chroma_loc is not None:
        bw.write_flag(1)         # chroma_loc_info_present_flag
        bw.write_ue(sps.chroma_loc)
        bw.write_ue(sps.chroma_loc)
    else:
        bw.write_flag(0)
    bw.write_flag(0)             # neutral_chroma_indication_flag
    bw.write_flag(0)             # field_seq_flag
    bw.write_flag(0)             # frame_field_info_present_flag
    bw.write_flag(0)             # default_display_window_flag
    if sps.timing_info:
        bw.write_flag(1)
        bw.write_bits(sps.timing_info[0], 32)
        bw.write_bits(sps.timing_info[1], 32)
        bw.write_flag(0)         # poc_proportional_to_timing_flag
        if sps.hrd:
            bw.write_flag(1)     # vui_hrd_parameters_present_flag
            _write_hrd(bw, sps)
        else:
            bw.write_flag(0)     # vui_hrd_parameters_present_flag
    else:
        bw.write_flag(0)
    bw.write_flag(0)             # bitstream_restriction_flag


# scale exponents per spec E.2.2: value = (v + 1) << (6|4 + scale)
HRD_BITRATE_SCALE = 4            # bitrate units of 2^(6+4) = 1024 bps
HRD_CPB_SCALE = 6                # cpb units of 2^(4+6) = 1024 bits


def hrd_units(sps):
    # (bit_rate_value_minus1, cpb_size_value_minus1, cbr) from the
    # configured rates, rounded UP to the unit granularity
    maxrate_bps, cpb_bits, cbr = sps.hrd
    br = max(-(-maxrate_bps // (1 << (6 + HRD_BITRATE_SCALE))), 1)
    cpb = max(-(-cpb_bits // (1 << (4 + HRD_CPB_SCALE))), 1)
    return br - 1, cpb - 1, cbr


def _write_hrd(bw: BitWriter, sps):
    # hrd_parameters(1, 0), spec E.2.2: NAL HRD only, one sub-layer,
    # one CPB, no sub-pic timing; 24-bit delay fields
    br_m1, cpb_m1, cbr = hrd_units(sps)
    bw.write_flag(1)             # nal_hrd_parameters_present_flag
    bw.write_flag(0)             # vcl_hrd_parameters_present_flag
    bw.write_flag(0)             # sub_pic_hrd_params_present_flag
    bw.write_bits(HRD_BITRATE_SCALE, 4)
    bw.write_bits(HRD_CPB_SCALE, 4)
    bw.write_bits(23, 5)         # initial_cpb_removal_delay_length_minus1
    bw.write_bits(23, 5)         # au_cpb_removal_delay_length_minus1
    bw.write_bits(23, 5)         # dpb_output_delay_length_minus1
    bw.write_flag(0)             # fixed_pic_rate_general_flag[0]
    bw.write_flag(0)             # fixed_pic_rate_within_cvs_flag[0]
    bw.write_flag(0)             # low_delay_hrd_flag[0]
    bw.write_ue(0)               # cpb_cnt_minus1[0]
    bw.write_ue(br_m1)           # bit_rate_value_minus1
    bw.write_ue(cpb_m1)          # cpb_size_value_minus1
    bw.write_flag(cbr)           # cbr_flag


def write_pps(pps: PPSInfo) -> bytes:
    bw = BitWriter()
    bw.write_ue(0)               # pps_pic_parameter_set_id
    bw.write_ue(0)               # pps_seq_parameter_set_id
    bw.write_flag(0)             # dependent_slice_segments_enabled_flag
    bw.write_flag(0)             # output_flag_present_flag
    bw.write_bits(0, 3)          # num_extra_slice_header_bits
    bw.write_flag(pps.sign_hiding)
    bw.write_flag(0)             # cabac_init_present_flag
    bw.write_ue(0)               # num_ref_idx_l0_default_active_minus1
    bw.write_ue(0)               # num_ref_idx_l1_default_active_minus1
    bw.write_se(pps.init_qp - 26)
    bw.write_flag(pps.constrained_intra)
    bw.write_flag(pps.transform_skip)
    bw.write_flag(pps.cu_qp_delta)
    if pps.cu_qp_delta:
        bw.write_ue(pps.diff_cu_qp_delta_depth)
    bw.write_se(pps.cb_qp_offset)
    bw.write_se(pps.cr_qp_offset)
    bw.write_flag(0)             # pps_slice_chroma_qp_offsets_present_flag
    bw.write_flag(pps.weighted_pred)
    bw.write_flag(pps.weighted_bipred)
    bw.write_flag(pps.transquant_bypass)
    bw.write_flag(0)             # tiles_enabled_flag
    bw.write_flag(pps.entropy_coding_sync)
    bw.write_flag(pps.loop_filter_across_slices)
    deblock_params_present = pps.deblocking_disabled or pps.beta_offset_div2 or pps.tc_offset_div2
    bw.write_flag(1 if deblock_params_present else 0)
    if deblock_params_present:
        bw.write_flag(0)         # deblocking_filter_override_enabled_flag
        bw.write_flag(pps.deblocking_disabled)
        if not pps.deblocking_disabled:
            bw.write_se(pps.beta_offset_div2)
            bw.write_se(pps.tc_offset_div2)
    bw.write_flag(0)             # pps_scaling_list_data_present_flag
    bw.write_flag(0)             # lists_modification_present_flag
    bw.write_ue(0)               # log2_parallel_merge_level_minus2
    bw.write_flag(0)             # slice_segment_header_extension_present_flag
    bw.write_flag(0)             # pps_extension_present_flag
    bw.rbsp_trailing_bits()
    return wrap_nal(NAL_PPS, bw.get_bytes())


def write_slice_header(sps: SPSInfo, pps: PPSInfo, slice_type: int,
                       slice_qp: int, *, nal_type: int = NAL_IDR_W_RADL,
                       poc: int = 0, sao_luma: int = 0, sao_chroma: int = 0,
                       first_slice: bool = True, slice_addr: int = 0,
                       slice_addr_bits: int = 0,
                       ref_poc_delta: int = 1, max_merge: int = 3,
                       pos_poc_delta: int = 0,
                       deblocking_disabled: Optional[bool] = None,
                       weights: Optional[dict] = None,
                       entry_point_offsets: Optional[List[int]] = None,
                       rps: Optional[Tuple] = None,
                       num_ref_l0: int = 1) -> BitWriter:
    """Returns a BitWriter positioned after byte_alignment() — ready for the
    caller to append CABAC slice data. slice_type: 0=B 1=P 2=I."""
    bw = BitWriter()
    bw.write_flag(1 if first_slice else 0)
    if nal_type >= 16 and nal_type <= 23:    # IRAP
        bw.write_flag(0)                     # no_output_of_prior_pics_flag
    bw.write_ue(0)                           # slice_pic_parameter_set_id
    if not first_slice:
        bw.write_bits(slice_addr, slice_addr_bits)
    bw.write_ue(slice_type)
    if nal_type not in (19, 20):             # not IDR
        bw.write_bits(poc & ((1 << sps.log2_max_poc_lsb) - 1), sps.log2_max_poc_lsb)
        bw.write_flag(0)                     # short_term_ref_pic_set_sps_flag
        # st_ref_pic_set (spec 7.3.7). rps overrides the single-ref shortcut:
        # (neg_pics, pos_pics) as [(delta_from_poc, used_by_curr), ...],
        # negatives nearest-first, positives nearest-first.
        if rps is None:
            neg = [(ref_poc_delta, 1)]
            pos = [(pos_poc_delta, 1)] if pos_poc_delta else []
        else:
            neg, pos = rps
        bw.write_ue(len(neg))                # num_negative_pics
        bw.write_ue(len(pos))                # num_positive_pics
        prev = 0
        for delta, used in neg:
            bw.write_ue(delta - prev - 1)    # delta_poc_s0_minus1[i]
            bw.write_flag(used)
            prev = delta
        prev = 0
        for delta, used in pos:
            bw.write_ue(delta - prev - 1)    # delta_poc_s1_minus1[i]
            bw.write_flag(used)
            prev = delta
        if sps.temporal_mvp:
            bw.write_flag(1)                 # slice_temporal_mvp_enabled_flag
    if sps.sao_enabled:
        bw.write_flag(sao_luma)
        if sps.chroma_format_idc != 0:
            bw.write_flag(sao_chroma)
    if slice_type != 2:                      # P/B
        if num_ref_l0 != 1:
            bw.write_flag(1)                 # num_ref_idx_active_override_flag
            bw.write_ue(num_ref_l0 - 1)      # num_ref_idx_l0_active_minus1
            if slice_type == 0:
                bw.write_ue(0)               # num_ref_idx_l1_active_minus1
        else:
            bw.write_flag(0)                 # num_ref_idx_active_override_flag
        if slice_type == 0:                  # B
            bw.write_flag(0)                 # mvd_l1_zero_flag
        if sps.temporal_mvp and num_ref_l0 > 1:
            # collocated_from_l0 inferred 1 for P; ref idx 0 = nearest ref
            bw.write_ue(0)                   # collocated_ref_idx
        if pps.weighted_pred and slice_type == 1:
            _write_pred_weight_table(bw, weights or {})
        bw.write_ue(5 - max_merge)           # five_minus_max_num_merge_cand
    bw.write_se(slice_qp - pps.init_qp)
    if deblocking_disabled is not None and deblocking_disabled != pps.deblocking_disabled:
        # would need deblocking_filter_override_enabled_flag in PPS
        raise NotImplementedError
    if pps.loop_filter_across_slices and \
            (sao_luma or sao_chroma or not pps.deblocking_disabled):
        bw.write_flag(1)                     # slice_loop_filter_across_slices
    if pps.entropy_coding_sync:
        offsets = entry_point_offsets or []
        bw.write_ue(len(offsets))            # num_entry_point_offsets
        if offsets:
            olen = max(1, max(o - 1 for o in offsets).bit_length())
            bw.write_ue(olen - 1)            # offset_len_minus1
            for o in offsets:
                bw.write_bits(o - 1, olen)   # entry_point_offset_minus1
    # byte_alignment(): alignment_bit_equal_to_one, then zero bits to boundary
    bw.write_bits(1, 1)
    bw.write_align_zero()
    return bw


def _write_pred_weight_table(bw: BitWriter, weights: dict):
    """pred_weight_table (spec 7.3.6.3), one L0 reference.

    weights: {'denom': int, 'luma': (w, o) | None, 'cb': (w, o) | None,
    'cr': (w, o) | None}; absent components signal flag 0 (decoder uses the
    default combine for them)."""
    denom = weights.get("denom", 6)
    bw.write_ue(denom)                       # luma_log2_weight_denom
    bw.write_se(0)                           # delta_chroma_log2_weight_denom
    luma = weights.get("luma")
    cb = weights.get("cb")
    cr = weights.get("cr")
    bw.write_flag(1 if luma else 0)          # luma_weight_l0_flag[0]
    bw.write_flag(1 if (cb or cr) else 0)    # chroma_weight_l0_flag[0]
    if luma:
        w, o = luma
        bw.write_se(w - (1 << denom))        # delta_luma_weight_l0
        bw.write_se(o)                       # luma_offset_l0
    if cb or cr:
        for comp in (cb, cr):
            w, o = comp if comp else ((1 << denom), 0)
            bw.write_se(w - (1 << denom))    # delta_chroma_weight_l0
            # delta_chroma_offset = o + ((128 * w) >> denom) - 128
            bw.write_se(o + ((128 * w) >> denom) - 128)
