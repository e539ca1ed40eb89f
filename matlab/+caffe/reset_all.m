function reset_all()
% clears every bridge-side solver/net and rotates init_key: all handles
% held by this MATLAB session become invalid
caffe_('reset');
end
