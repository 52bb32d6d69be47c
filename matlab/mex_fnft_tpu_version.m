% MEX_FNFT_TPU_VERSION Version of the fnft-tpu library.
%
%   [major, minor, patch, suffix] = MEX_FNFT_TPU_VERSION()
%
% DESCRIPTION
%   major.minor.patch is the reference FNFT version this framework
%   provides capability parity with; suffix identifies the fnft-tpu
%   build (e.g. '-tpu0.1.0').
