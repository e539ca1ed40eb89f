function set_mode_cpu()
caffe_('set_mode_cpu');
end
